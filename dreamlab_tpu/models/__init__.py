from . import clip_text, configs, layers, superres, unet, vae

__all__ = ["clip_text", "configs", "layers", "superres", "unet", "vae"]

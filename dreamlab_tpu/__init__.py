"""Dream Lab TPU — a TPU-native Stable Diffusion LCM inference framework.

A ground-up rebuild of the capabilities of ``Mario5Gray/Stable-Diffusion-1.5-LCM-ONNX-RKNN2``
("Dream Lab") as an idiomatic JAX/XLA/Pallas framework for TPU:

- ``scheduler``  — LCM scheduler as pure-JAX functions (jit-safe, stateless).
- ``models``     — CLIP text encoder, SD1.5/SDXL UNet, VAE decoder, super-resolution
                   CNN as pure functional NHWC JAX models (params are inputs).
- ``ops``        — Pallas TPU kernels (flash attention, fused GroupNorm+SiLU) with
                   XLA fallbacks.
- ``pipeline``   — jit-compiled txt2img: CLIP encode → N-step LCM denoise loop →
                   VAE decode, one XLA program per (arch, H, W, steps) bucket.
- ``parallel``   — device mesh + data/tensor sharding for multi-chip serving.
- ``engine``     — worker pool, mode system, HBM model registry, model detection.
- ``serving``    — REST server preserving the reference's public API contracts.
- ``persistence``— storage providers (memory / filesystem / Redis).
- ``yume``       — background latent-space exploration ("dreaming").
- ``invokers``   — ComfyUI delegation client + job store.

The public REST/worker contracts mirror the reference (see SURVEY.md Appendix A);
the execution core is all-new TPU-first design.
"""

__version__ = "0.1.0"

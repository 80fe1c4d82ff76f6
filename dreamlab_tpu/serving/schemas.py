"""Request schemas (pydantic v2), mirroring the reference's public contracts.

GenerateRequest fields and validation ranges are the reference's
(/root/reference/server/lcm_sr_server.py:117-135, SURVEY.md Appendix A):
prompt, mode?, size "WxH" (default 512x512), num_inference_steps 1-50
(default 4), guidance_scale 0-20 (default 1.0), seed 0..2³¹-1?, style_lora
{style?, level 0-8}, superres options.
"""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field, field_validator

from ..engine.base import parse_size


class StyleLoRARequest(BaseModel):
    style: Optional[str] = None
    level: int = Field(default=0, ge=0, le=8)


class GenerateRequest(BaseModel):
    prompt: str
    mode: Optional[str] = None
    size: str = "512x512"
    num_inference_steps: int = Field(default=4, ge=1, le=50)
    guidance_scale: float = Field(default=1.0, ge=0.0, le=20.0)
    seed: Optional[int] = Field(default=None, ge=0, le=2**31 - 1)
    negative_prompt: Optional[str] = None
    style_lora: Optional[StyleLoRARequest] = None
    superres: bool = False
    superres_format: str = "png"
    superres_quality: int = Field(default=92, ge=1, le=100)
    superres_magnitude: int = Field(default=2, ge=1, le=3)
    # refiner-class models only (5 micro-conditioning ids); ignored otherwise
    aesthetic_score: Optional[float] = Field(default=None, ge=0.0, le=10.0)
    # ControlNet conditioning: base64 PNG/JPEG hint image (raw b64 or data
    # URL); requires the active mode to declare a `controlnet:` in
    # modes.yaml. The server resizes the hint to the output size.
    control_image: Optional[str] = None
    controlnet_scale: Optional[float] = Field(default=None, ge=0.0, le=2.0)

    @field_validator("size")
    @classmethod
    def _check_size(cls, v: str) -> str:
        parse_size(v)  # raises ValueError on bad format
        return v

    @field_validator("superres_format")
    @classmethod
    def _check_fmt(cls, v: str) -> str:
        if v.lower() not in ("png", "jpeg", "jpg"):
            raise ValueError("superres_format must be png or jpeg")
        return v.lower()


class A1111Txt2ImgRequest(BaseModel):
    """AUTOMATIC1111 /sdapi/v1/txt2img subset
    (reference compat_endpoints.py:29-46)."""

    prompt: str = ""
    negative_prompt: Optional[str] = None
    steps: int = Field(default=4, ge=1, le=50)
    cfg_scale: float = Field(default=1.0, ge=0.0, le=20.0)
    width: int = 512
    height: int = 512
    seed: int = -1  # -1 ⇒ random
    batch_size: int = Field(default=1, ge=1, le=8)
    sampler_name: Optional[str] = None
    styles: Optional[list] = None


class OpenAIImagesRequest(BaseModel):
    """OpenAI Images /v1/images/generations subset
    (reference compat_endpoints.py:49-60)."""

    prompt: str
    n: int = Field(default=1, ge=1, le=8)
    size: str = "512x512"
    response_format: str = "b64_json"
    model: Optional[str] = None
    user: Optional[str] = None

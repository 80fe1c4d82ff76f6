"""LoRA parsing/merging, model detection, and the TPU worker protocol."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dreamlab_tpu import lora as lora_mod
from dreamlab_tpu.engine.base import GenSpec
from dreamlab_tpu.engine.tpu_worker import (
    TPUPipelineWorker,
    latents_to_fingerprint,
    png_encode,
)
from dreamlab_tpu.models import configs, unet
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.testing import random_bundle
from dreamlab_tpu.utils.model_detector import detect_model, DetectionError
from tests.test_loader import make_tiny_checkpoint


# ---------------------------------------------------------------------------
# lora
# ---------------------------------------------------------------------------


def _make_lora_sd(fmt, c=32, ctx=32, rank=4):
    rs = np.random.RandomState(0)
    down = rs.randn(rank, c).astype(np.float32)
    up = rs.randn(c, rank).astype(np.float32)
    if fmt == "peft":
        return {
            "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": down,
            "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": up,
        }
    return {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha": np.array(rank, np.float32),
    }


@pytest.mark.parametrize("fmt", ["peft", "kohya"])
def test_lora_parse_formats(fmt):
    t = lora_mod.parse_lora_state_dict(_make_lora_sd(fmt))
    assert t.num_modules == 1
    path = next(iter(t.unet))
    assert path == "down.0.attentions.0.blocks.0.attn1.q"


def test_lora_merge_changes_only_target():
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg, np.random.RandomState(0))
    t = lora_mod.parse_lora_state_dict(_make_lora_sd("kohya"))
    merged = lora_mod.merge_lora_into_tree(params, t.unet, scale=0.5)

    target_old = params["down"][0]["attentions"][0]["blocks"][0]["attn1"]["q"]["w"]
    target_new = merged["down"][0]["attentions"][0]["blocks"][0]["attn1"]["q"]["w"]
    assert not np.allclose(np.asarray(target_new), np.asarray(target_old))
    # delta = scale * (alpha/r) * (up@down).T
    down, up, alpha = t.unet["down.0.attentions.0.blocks.0.attn1.q"]
    want = np.asarray(target_old) + 0.5 * (alpha / 4) * (up @ down).T
    np.testing.assert_allclose(np.asarray(target_new), want, rtol=1e-5, atol=1e-6)
    # untouched leaf identical
    np.testing.assert_array_equal(
        np.asarray(merged["conv_in"]["w"]), np.asarray(params["conv_in"]["w"])
    )


def test_lora_merge_scale_zero_is_identity():
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg, np.random.RandomState(0))
    t = lora_mod.parse_lora_state_dict(_make_lora_sd("peft"))
    merged = lora_mod.merge_lora_into_tree(params, t.unet, scale=0.0)
    assert merged is params


def test_lora_text_encoder_keys():
    rs = np.random.RandomState(0)
    sd = {
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": rs.randn(2, 8).astype(np.float32),
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": rs.randn(8, 2).astype(np.float32),
    }
    t = lora_mod.parse_lora_state_dict(sd)
    assert list(t.text) == ["layers.0.attn.q"]


def test_style_strength_ladder():
    s = lora_mod.StyleDef(name="x", path="/x.safetensors")
    assert s.strength_for_level(0) == 0.0
    assert s.strength_for_level(1) == 0.4
    assert s.strength_for_level(8) == 1.8
    assert s.strength_for_level(99) == 1.8


def test_parse_style_request():
    assert lora_mod.parse_style_request(None, 3) == (None, 0)
    assert lora_mod.parse_style_request("anime", 0) == (None, 0)
    assert lora_mod.parse_style_request("anime", 3) == ("anime", 3)
    assert lora_mod.parse_style_request("anime", "bad") == (None, 0)
    assert lora_mod.parse_style_request("anime", 99) == ("anime", 8)


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------


def test_detect_diffusers_dir(tmp_path):
    d = make_tiny_checkpoint(tmp_path / "ckpt")
    info = detect_model(d)
    assert info.format == "diffusers_dir"
    assert info.cross_attention_dim == 768
    assert info.variant == "SD15"
    assert info.arch == "sd15"
    assert info.native_size == 512
    assert "512x512" in info.recommended_sizes


def test_detect_lora_file(tmp_path):
    from safetensors.numpy import save_file

    p = str(tmp_path / "style.safetensors")
    save_file(_make_lora_sd("kohya"), p)
    info = detect_model(p)
    assert info.is_lora and info.format == "lora"


def test_detect_single_file_checkpoint(tmp_path):
    from safetensors.numpy import save_file

    p = str(tmp_path / "ckpt.safetensors")
    save_file({
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((64, 2048), np.float32),
    }, p)
    info = detect_model(p)
    assert info.cross_attention_dim == 2048
    assert info.variant == "SDXL"
    assert info.arch == "sdxl"
    assert info.native_size == 1024


def test_detect_missing_path():
    with pytest.raises(DetectionError):
        detect_model("/no/such/path")


# ---------------------------------------------------------------------------
# tpu worker
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def worker():
    bundle = random_bundle("sd15", tiny=True)
    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    return TPUPipelineWorker(pipe, worker_id=0)


def test_run_job_returns_png(worker):
    png, seed = worker.run_job(GenSpec(prompt="a cat", size="32x32",
                                       num_inference_steps=2, seed=5))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert seed == 5
    # embedded generation metadata (parameter-resume contract)
    from PIL import Image
    import io
    img = Image.open(io.BytesIO(png))
    assert "Seed: 5" in img.text["parameters"]


def test_run_job_deterministic(worker):
    spec = GenSpec(prompt="a cat", size="32x32", num_inference_steps=2, seed=42)
    a, _ = worker.run_job(spec)
    b, _ = worker.run_job(spec)
    assert a == b


def test_run_job_with_latents_512_bytes(worker):
    png, seed, lat = worker.run_job_with_latents(
        GenSpec(prompt="x", size="32x32", num_inference_steps=2, seed=1)
    )
    assert len(lat) == 512  # [1, 4, 8, 8] float16
    arr = np.frombuffer(lat, np.float16).reshape(1, 4, 8, 8)
    assert np.isfinite(arr).all()


def test_random_seed_assigned(worker):
    png, seed = worker.run_job(GenSpec(prompt="x", size="32x32",
                                       num_inference_steps=1))
    assert 0 <= seed < 2**31


def test_unknown_style_rejected(worker):
    with pytest.raises(ValueError):
        worker.run_job(GenSpec(prompt="x", size="32x32", num_inference_steps=1,
                               style="nope", style_level=3))


def test_fingerprint_block_mean():
    lat = np.arange(16 * 16 * 4, dtype=np.float32).reshape(1, 16, 16, 4)
    out = np.frombuffer(latents_to_fingerprint(lat), np.float16).reshape(1, 4, 8, 8)
    want = lat[0].reshape(8, 2, 8, 2, 4).mean(axis=(1, 3)).transpose(2, 0, 1)
    np.testing.assert_allclose(out[0], want.astype(np.float16))


def test_native_png_encoder_roundtrip_and_metadata():
    import io
    from PIL import Image
    from dreamlab_tpu.native import encode_png, native_available

    arr = np.random.RandomState(0).randint(0, 255, (48, 40, 3), np.uint8)
    if native_available():
        png = encode_png(arr)
        back = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        np.testing.assert_array_equal(back, arr)
        gray = encode_png(arr[:, :, 0])
        g = np.asarray(Image.open(io.BytesIO(gray)).convert("L"))
        np.testing.assert_array_equal(g, arr[:, :, 0])
    # png_encode path (native or PIL) must carry tEXt metadata either way
    png2 = png_encode(arr, metadata={"parameters": "Steps: 4, Seed: 9"})
    img = Image.open(io.BytesIO(png2))
    assert img.text["parameters"] == "Steps: 4, Seed: 9"
    np.testing.assert_array_equal(np.asarray(img.convert("RGB")), arr)


def test_run_jobs_batched_matches_solo(worker):
    specs = [
        GenSpec(prompt=p, size="32x32", num_inference_steps=2, seed=s)
        for p, s in [("a cat", 11), ("a dog", 22), ("a sunset", 33)]
    ]
    solo = [worker.run_job(GenSpec(**vars(s))) for s in specs]
    batched = worker.run_jobs(specs)
    assert len(batched) == 3
    for (png_b, seed_b), (png_s, seed_s) in zip(batched, solo):
        assert seed_b == seed_s
        assert png_b == png_s  # byte-identical: batching never changes images


def test_run_jobs_mixed_guidance_matches_solo(worker):
    """Mixed sliders coalesce (round 4): per-row w-embeddings/negatives mean
    LCM requests with different guidance scales and negative prompts share
    one batched call — and each row is still bit-identical to its solo run."""
    specs = [
        GenSpec(prompt="a cat", size="32x32", num_inference_steps=2, seed=11,
                guidance_scale=1.0),
        GenSpec(prompt="a dog", size="32x32", num_inference_steps=2, seed=22,
                guidance_scale=7.5, negative_prompt="blurry"),
        GenSpec(prompt="a sunset", size="32x32", num_inference_steps=2,
                seed=33, guidance_scale=3.0),
    ]
    assert all(worker.batchable(specs[0], s) for s in specs[1:])
    solo = [worker.run_job(GenSpec(**vars(s))) for s in specs]
    batched = worker.run_jobs(specs)
    for (png_b, seed_b), (png_s, seed_s) in zip(batched, solo):
        assert seed_b == seed_s
        assert png_b == png_s  # byte-identical despite mixed guidance
    # guidance actually bites: different w gives a different image
    alt = worker.run_job(GenSpec(prompt="a cat", size="32x32",
                                 num_inference_steps=2, seed=11,
                                 guidance_scale=9.0))
    assert alt[0] != solo[0][0]


def test_cfg_mixed_negatives_and_scales_match_solo():
    """Classic-CFG coalescing (non-LCM model): per-row guidance values and
    per-row negative prompts in one batch reproduce each solo run exactly."""
    bundle = random_bundle("sdxl", tiny=True)
    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    worker = TPUPipelineWorker(pipe, worker_id=0)
    specs = [
        GenSpec(prompt="a cat", size="32x32", num_inference_steps=2, seed=1,
                guidance_scale=7.5, negative_prompt="blurry"),
        GenSpec(prompt="a dog", size="32x32", num_inference_steps=2, seed=2,
                guidance_scale=3.0, negative_prompt="low quality"),
    ]
    assert worker.batchable(specs[0], specs[1])
    # the cfg/no-cfg program split stays a bucket boundary
    assert not worker.batchable(
        specs[0],
        GenSpec(prompt="x", size="32x32", num_inference_steps=2,
                guidance_scale=1.0),
    )
    solo = [worker.run_job(GenSpec(**vars(s))) for s in specs]
    batched = worker.run_jobs(specs)
    for (png_b, seed_b), (png_s, seed_s) in zip(batched, solo):
        assert seed_b == seed_s
        assert png_b == png_s


def test_batchable_predicate(worker):
    a = GenSpec(prompt="x", size="32x32", num_inference_steps=2)
    ok = lambda **kw: worker.batchable(a, GenSpec(prompt="y", **kw))
    assert ok(size="32x32", num_inference_steps=2)
    assert not ok(size="64x64", num_inference_steps=2)
    assert not ok(size="32x32", num_inference_steps=4)
    # LCM mode: guidance rides per-row w-embeddings and negatives are unused
    # — both coalesce (round 4; the old predicate forced batch=1 whenever
    # sliders differed)
    assert ok(size="32x32", num_inference_steps=2, guidance_scale=3.0)
    assert ok(size="32x32", num_inference_steps=2, negative_prompt="blurry")
    assert not ok(size="32x32", num_inference_steps=2, style="anime",
                  style_level=2)


def test_style_swap_while_batch_in_flight(tmp_path):
    """run_jobs_pipelined captures its param buffers at dispatch: resetting
    or changing the style BEFORE finalize() must not change the in-flight
    batch's output (the safety claim behind cross-batch pipelining)."""
    from safetensors.numpy import save_file

    from dreamlab_tpu.engine.base import GenSpec
    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.lora import StyleDef
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    base = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    lora_path = str(tmp_path / "style.safetensors")
    save_file({
        f"{base}.lora_A.weight": rs.randn(2, 32).astype(np.float32),
        f"{base}.lora_B.weight": rs.randn(32, 2).astype(np.float32),
    }, lora_path)
    styles = {"vivid": StyleDef(name="vivid", path=lora_path)}

    pipe = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
    worker = TPUPipelineWorker(pipe, 0, styles=styles)

    specs = [
        GenSpec(prompt=f"p{i}", size="32x32", num_inference_steps=2,
                seed=i, style="vivid", style_level=3)
        for i in range(2)
    ]
    # reference outputs: fully-settled batched run with the style
    want = worker.run_jobs(specs)

    # dispatch with the style, then flip the style BEFORE finalizing
    finalize = worker.run_jobs_pipelined(specs)
    plain = [GenSpec(prompt="x", size="32x32", num_inference_steps=2, seed=9)]
    _ = worker.run_jobs(plain)  # swaps weights back to base and runs
    got = finalize()

    for (png_a, seed_a), (png_b, seed_b) in zip(want, got):
        assert seed_a == seed_b
        assert png_a == png_b, "in-flight batch was affected by a style swap"


# ---------------------------------------------------------------------------
# merged-weights LRU cache (round 5: style flips are pointer swaps)
# ---------------------------------------------------------------------------


def _save_style(tmp_path, name, seed):
    from safetensors.numpy import save_file
    from dreamlab_tpu.lora import StyleDef

    rs = np.random.RandomState(seed)
    base = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    path = str(tmp_path / f"{name}.safetensors")
    save_file({
        f"{base}.lora_A.weight": rs.randn(2, 32).astype(np.float32),
        f"{base}.lora_B.weight": rs.randn(32, 2).astype(np.float32),
    }, path)
    return StyleDef(name=name, path=path)


def _styled_worker(tmp_path, monkeypatch, cache_max=None):
    from dreamlab_tpu.engine import tpu_worker as tw_mod
    from dreamlab_tpu.engine.model_registry import reset_model_registry

    if cache_max is not None:
        monkeypatch.setenv("DREAMLAB_LORA_CACHE", str(cache_max))
    reset_model_registry()
    styles = {n: _save_style(tmp_path, n, i) for i, n in
              enumerate(["vivid", "noir"])}
    pipe = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
    w = TPUPipelineWorker(pipe, worker_id=0, styles=styles)
    merges = []
    orig = lora_mod.merge_lora_into_tree
    monkeypatch.setattr(
        tw_mod, "merge_lora_into_tree",
        lambda *a, **k: (merges.append(1), orig(*a, **k))[1],
    )
    return w, merges


def _spec(style, level=3, seed=1):
    return GenSpec(prompt="x", size="32x32", num_inference_steps=1,
                   seed=seed, style=style, style_level=level)


def test_lora_merged_cache_hit(tmp_path, monkeypatch):
    """Second application of a (style, level) reuses the cached merged tree —
    no re-merge (VERDICT r4 #3: styled/unstyled alternation paid ~1.1 s/flip)."""
    w, merges = _styled_worker(tmp_path, monkeypatch)
    w.run_job(_spec("vivid"))          # merge #1 (run_job un-styles after)
    assert len(merges) == 1
    w.run_job(_spec("vivid"))          # cache hit: still 1
    assert len(merges) == 1
    a, _ = w.run_job(_spec("vivid", seed=42))
    w.run_job(_spec(None, level=0, seed=5))
    b, _ = w.run_job(_spec("vivid", seed=42))
    assert a == b                      # cached tree produces identical bytes
    w.run_job(_spec("vivid", level=5)) # different scale → merge #2
    assert len(merges) == 2
    w.run_job(_spec("vivid", level=3)) # both levels resident (default cap 2)
    assert len(merges) == 2


def test_lora_merged_cache_eviction(tmp_path, monkeypatch):
    from dreamlab_tpu.engine.model_registry import get_model_registry

    w, merges = _styled_worker(tmp_path, monkeypatch, cache_max=1)
    w.run_job(_spec("vivid"))
    assert len(merges) == 1
    reg = get_model_registry()
    names = lambda: [m.name for m in reg.list_models()]
    assert len(names()) == 1 and names()[0].startswith("lora:0:") \
        and names()[0].endswith(":vivid:3")
    w.run_job(_spec("noir"))           # evicts vivid (cap 1)
    assert len(merges) == 2
    assert len(names()) == 1 and names()[0].endswith(":noir:3")
    w.run_job(_spec("vivid"))          # re-merge after eviction
    assert len(merges) == 3
    w.close()                          # close unregisters cache entries
    assert [m for m in reg.list_models() if m.name.startswith("lora:")] == []


def test_lora_merged_cache_respects_hbm(tmp_path, monkeypatch):
    """No HBM headroom → merge-and-drop (never cache past can_fit)."""
    from dreamlab_tpu.engine.model_registry import get_model_registry

    w, merges = _styled_worker(tmp_path, monkeypatch)
    monkeypatch.setattr(get_model_registry(), "can_fit", lambda n: False)
    w.run_job(_spec("vivid"))
    w.run_job(_spec("vivid"))
    assert len(merges) == 2            # re-merged: nothing was cached
    assert w._merged_cache == {}


def test_lora_merged_cache_disabled(tmp_path, monkeypatch):
    w, merges = _styled_worker(tmp_path, monkeypatch, cache_max=0)
    w.run_job(_spec("vivid"))
    w.run_job(_spec("vivid"))
    assert len(merges) == 2
    assert w._merged_cache == {}


def test_lora_merged_cache_two_workers_no_collision(tmp_path, monkeypatch):
    """Multi-tenant pools build every worker with worker_id=0: two resident
    workers caching the SAME (style, level) must not collide in the
    registry, and closing one must not unregister the other's entry."""
    from dreamlab_tpu.engine.model_registry import (
        get_model_registry, reset_model_registry,
    )
    from dreamlab_tpu.lora import StyleDef

    reset_model_registry()
    style = _save_style(tmp_path, "vivid", 0)
    workers = []
    for _ in range(2):
        pipe = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
        workers.append(TPUPipelineWorker(pipe, worker_id=0,
                                         styles={"vivid": style}))
    for w in workers:
        w.run_job(_spec("vivid"))
    reg = get_model_registry()
    lora_names = [m.name for m in reg.list_models()
                  if m.name.startswith("lora:")]
    assert len(lora_names) == 2 and len(set(lora_names)) == 2
    workers[0].close()
    remaining = [m.name for m in reg.list_models()
                 if m.name.startswith("lora:")]
    assert len(remaining) == 1  # the survivor's entry is intact
    assert len(workers[1]._merged_cache) == 1
    workers[1].close()
    assert [m for m in reg.list_models() if m.name.startswith("lora:")] == []

"""Model asset manifests (round 4 — the reference's model/Assets records,
/root/reference/model/Assets/LCM-Dreamshaper-V7-ONNX.json:1-40, rebuilt for
diffusers/safetensors layouts with offline verification)."""

import json
import os

import pytest

from dreamlab_tpu.utils import assets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS_DIR = os.path.join(REPO, "model", "Assets")


def test_shipped_manifests_parse():
    ms = assets.load_manifests(ASSETS_DIR)
    assert "LCM-Dreamshaper-V7" in ms
    assert "SDXL-Base-1.0" in ms
    lcm = ms["LCM-Dreamshaper-V7"]
    assert lcm.pipeline == "lcm-sd15"
    assert lcm.layout == "diffusers"
    assert any(f.path.startswith("unet/") for f in lcm.files)


def test_plan_resolves_urls():
    ms = assets.load_manifests(ASSETS_DIR)
    lines = assets.plan(ms["LCM-Dreamshaper-V7"])
    assert lines[0].startswith("# LCM-Dreamshaper-V7")
    # entries without explicit url resolve against the repository (the
    # reference ModelFiles convention)
    assert any("resolve/main/unet/diffusion_pytorch_model.safetensors" in ln
               for ln in lines)
    assert all("LCM-Dreamshaper-V7/" in ln for ln in lines[1:])


def test_verify_missing_and_delivered(tmp_path):
    m = assets.parse_manifest(
        os.path.join(ASSETS_DIR, "LCM-Dreamshaper-V7.json")
    )
    problems = assets.verify(m, str(tmp_path), run_detector=False)
    assert problems and all("missing file" in p for p in problems)

    root = tmp_path / m.name
    for f in m.files:
        p = root / f.path
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    assert assets.verify(m, str(tmp_path), run_detector=False) == []

    # empty file is flagged
    (root / m.files[0].path).write_bytes(b"")
    probs = assets.verify(m, str(tmp_path), run_detector=False)
    assert probs == [f"empty file: {root / m.files[0].path}"]


def test_manifest_validation_errors(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"name": "x", "layout": "diffusers"}))
    with pytest.raises(ValueError, match="missing keys"):
        assets.parse_manifest(str(bad))
    bad.write_text(json.dumps({
        "name": "x", "repository": "r", "pipeline": "p",
        "layout": "tarball", "files": ["a"],
    }))
    with pytest.raises(ValueError, match="unknown layout"):
        assets.parse_manifest(str(bad))


def test_cli_list_and_verify(tmp_path, capsys):
    rc = assets.main(["--assets", ASSETS_DIR, "--list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "LCM-Dreamshaper-V7" in out and "sdxl" in out

    rc = assets.main([
        "--assets", ASSETS_DIR, "--root", str(tmp_path),
        "--verify", "LCM-Dreamshaper-V7",
    ])
    assert rc == 1  # nothing delivered yet
    assert "missing file" in capsys.readouterr().out

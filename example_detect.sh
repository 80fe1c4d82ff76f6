#!/bin/bash
# Example usage of the extensible model-detector CLI
# (docs/MODEL_DETECTION.md; reference example_detect.sh).

echo "# detect one checkpoint (diffusers dir, single .safetensors, or .ckpt)"
echo python -m dreamlab_tpu.utils.model_detector /models/DreamShaper.safetensors
echo

echo "# detect a LoRA (classifies + compat width from the adapter shapes)"
echo python -m dreamlab_tpu.utils.model_detector /models/loras/anime.safetensors
echo

echo "# scan a directory"
echo python -m dreamlab_tpu.utils.model_detector --scan /models
echo

echo "# extended stack with the example detectors (LCM/Turbo/Refiner/"
echo "# License/LoRA-strength) from Python:"
cat <<'PY'
from dreamlab_tpu.utils.custom_detector_examples import make_extended_detector
info = make_extended_detector().detect("/models/DreamShaper.safetensors")
print(info.arch, info.extra.get("is_lcm"), info.extra.get("suggested_strength_levels"))
PY

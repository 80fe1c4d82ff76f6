#!/usr/bin/env bash
# Example REST calls (parity with the reference's sample-rest-call.sh).
set -euo pipefail
BASE="${BASE:-http://localhost:8000}"

echo "== health =="
curl -s "$BASE/health"; echo

echo "== txt2img =="
curl -s -X POST "$BASE/generate" \
  -H 'Content-Type: application/json' \
  -d '{
    "prompt": "a cat in a space suit, cinematic lighting",
    "size": "512x512",
    "num_inference_steps": 4,
    "guidance_scale": 1.0,
    "seed": 42,
    "superres": false
  }' \
  -D /dev/stderr -o cat.png
echo "wrote cat.png"

echo "== txt2img + superres + style =="
curl -s -X POST "$BASE/generate" \
  -H 'Content-Type: application/json' \
  -d '{
    "prompt": "a watercolor village",
    "num_inference_steps": 8,
    "style_lora": {"style": "anime", "level": 3},
    "superres": true,
    "superres_magnitude": 2,
    "superres_format": "jpeg"
  }' -o village.jpg
echo "wrote village.jpg"

echo "== img2img =="
curl -s -X POST "$BASE/v1/img2img" \
  -F file=@cat.png -F prompt="repaint as an oil painting" \
  -F strength=0.6 -F steps=4 -o cat_oil.png
echo "wrote cat_oil.png"

echo "== standalone superres =="
curl -s -X POST "$BASE/superres" \
  -F file=@cat.png -F magnitude=2 -F out_format=png -o cat_x9.png
echo "wrote cat_x9.png"

echo "== modes =="
curl -s "$BASE/api/modes"; echo
curl -s -X POST "$BASE/api/modes/switch" \
  -H 'Content-Type: application/json' \
  -d '{"mode": "dreamshaper", "wait_seconds": 60}'; echo

echo "== A1111 compat =="
curl -s -X POST "$BASE/sdapi/v1/txt2img" \
  -H 'Content-Type: application/json' \
  -d '{"prompt": "a lighthouse", "steps": 4, "width": 512, "height": 512, "seed": -1}' \
  | head -c 200; echo

echo "== dreams =="
curl -s -X POST "$BASE/dreams/start" \
  -H 'Content-Type: application/json' \
  -d '{"prompt": "bioluminescent forest", "strategy": "temperature"}'; echo
sleep 5
curl -s "$BASE/dreams/top?n=3"; echo
curl -s -X POST "$BASE/dreams/stop"; echo

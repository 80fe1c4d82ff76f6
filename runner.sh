#!/bin/bash
# Container runner for the Dream Lab TPU image (deploy parity with the
# reference's runner.sh — docker run wrapper with env-file layering).
set -e

if [ -z "${MODELS_HOST_PATH}" ]; then
  echo "set MODELS_HOST_PATH (host directory with checkpoint dirs/files)"
  exit 1
fi

IMAGE="${IMAGE:-dreamlab-tpu:latest}"
PORT="${PORT:-8000}"

set -x
docker run --rm -it \
  --network dreamlab_appnet \
  -p "${PORT}:${PORT}" \
  --env-file env.tpu.example \
  ${ENV_FILE:+--env-file "$ENV_FILE"} \
  -v "${MODELS_HOST_PATH}:/models:ro" \
  --device=/dev/vfio --device=/dev/accel0 \
  "$@" \
  "${IMAGE}"

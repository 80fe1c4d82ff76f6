#!/usr/bin/env bash
# Server launcher (parity with the reference's start.sh): verify the
# accelerator, then start serving with env-file configuration.
set -euo pipefail

ENV_FILE="${ENV_FILE:-env.tpu.example}"
if [[ -f "$ENV_FILE" ]]; then
  set -a
  # shellcheck disable=SC1090
  source "$ENV_FILE"
  set +a
fi

python -m dreamlab_tpu.utils.verify_tpu || {
  echo "accelerator verification failed" >&2
  exit 1
}

exec python -m dreamlab_tpu.serving.run

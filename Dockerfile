# Dream Lab TPU serving image (deployment parity with the reference's
# Dockerfile, TPU flavor). Build args let the same file target a CPU dev
# image (BASE=python:3.12-slim) or a TPU host image.

ARG BASE=python:3.12-slim
FROM ${BASE}

# native toolchain for the C PNG encoder (+ zlib headers)
RUN apt-get update && apt-get install -y --no-install-recommends \
    gcc zlib1g-dev curl && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# jax[tpu] must match the host's TPU runtime; pin in requirements-tpu.txt
COPY requirements-serve.txt ./
RUN pip install --no-cache-dir -r requirements-serve.txt

COPY dreamlab_tpu/ dreamlab_tpu/
COPY ui/ ui/
COPY pyproject.toml README.md ./
RUN pip install --no-cache-dir --no-build-isolation -e .

# prebuild the native PNG encoder so first request isn't a compile
RUN python -c "from dreamlab_tpu.native import native_available; \
    assert native_available(), 'pngenc build failed'"

ENV PORT=8000 \
    STORAGE_PROVIDER=MEMORY \
    LOG_LEVEL=INFO \
    DREAMLAB_COMPILE_CACHE=/cache/xla
VOLUME ["/models", "/cache"]
EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=5s --start-period=300s \
    CMD curl -sf http://localhost:8000/health || exit 1

CMD ["python", "-m", "dreamlab_tpu.serving.run"]

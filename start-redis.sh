#!/bin/bash
# Redis side-container for storage + Yume dream sessions (reference parity).
docker network create dreamlab_appnet 2>/dev/null || true

docker run -d \
  --name redis \
  --hostname redis \
  --network dreamlab_appnet \
  -p 6379:6379 \
  redis:7

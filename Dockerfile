# Deployment image for TPU VMs (parity with the reference's CUDA
# Dockerfile + docker-compose.yml, re-targeted at Cloud TPU: the reference
# builds a CUDA devel image and serves its web UI; here the runtime is
# jax[tpu] and there is no extension compile step — Pallas kernels are
# JIT-compiled on first use and cached under /data/compile-cache).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY exllama_tpu ./exllama_tpu
COPY csrc ./csrc
COPY benchmark.py bench.py ./

# jax[tpu] pulls libtpu from the Google releases index on a TPU VM.
# Separate steps so a failed TPU-runtime install fails the build instead
# of silently producing a CPU-only image.
RUN pip install --no-cache-dir -e ".[models,web]"
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# persistent XLA compile cache + model mount points (reference
# docker-compose.yml mounts ./models the same way)
VOLUME ["/data/models", "/data/compile-cache"]
ENV EXLLAMA_TPU_CACHE_DIR=/data/compile-cache

EXPOSE 5000
ENTRYPOINT ["/app/entrypoint.sh"]
COPY entrypoint.sh /app/entrypoint.sh

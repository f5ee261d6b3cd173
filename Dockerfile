# Container image for ptgnn_tpu (parity artifact with the reference's
# Dockerfile, /root/reference/Dockerfile — theirs installs CUDA torch +
# torch-scatter; this framework's only accelerator dependency is JAX).
#
# Build for a TPU VM:   docker build --build-arg JAX_TARGET=tpu -t ptgnn-tpu .
# Build for CPU (CI):   docker build -t ptgnn-tpu .
FROM python:3.12-slim

ARG JAX_TARGET=cpu

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/ptgnn_tpu
COPY pyproject.toml README.md ./
COPY ptgnn_tpu ./ptgnn_tpu
COPY tests ./tests

# jax[tpu] pulls libtpu from the Google releases index on TPU VMs.
RUN if [ "$JAX_TARGET" = "tpu" ]; then \
        pip install --no-cache-dir "jax[tpu]" \
            -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
    else \
        pip install --no-cache-dir "jax[cpu]"; \
    fi \
    && pip install --no-cache-dir -e ".[dev]" \
        --extra-index-url https://download.pytorch.org/whl/cpu

# Prebuild the C++ batch assembler (rebuilds on source-hash mismatch at
# import time otherwise).
RUN make -C ptgnn_tpu/native

# Smoke: public imports resolve and a kernel-free forward runs.
RUN python -c "import ptgnn_tpu, ptgnn_tpu.graph.gnn, ptgnn_tpu.ops.segment"

CMD ["python", "-c", "import ptgnn_tpu; print('ptgnn_tpu ready')"]

# instagraal-tpu container (reference parity: Dockerfile).
#
# Default base ships CPU JAX — correct for pre/polish/post/stats work
# and for running the test suite on the virtual 8-device mesh. For TPU
# VMs, build with:
#   docker build --build-arg JAX_EXTRA='jax[tpu]' -t instagraal-tpu .
FROM python:3.12-slim

ARG JAX_EXTRA=jax

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY instagraal_tpu ./instagraal_tpu
COPY tests ./tests
COPY scripts ./scripts

RUN pip install --no-cache-dir "${JAX_EXTRA}" && \
    pip install --no-cache-dir ".[test]"

# build the native pairs scanner ahead of time (the ctypes loader
# rebuilds on demand otherwise)
RUN python -c "import instagraal_tpu.native as n; n.load_pairs_scan()" || true

ENTRYPOINT ["instagraal"]
CMD ["--help"]

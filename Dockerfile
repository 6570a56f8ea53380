# Container packaging (reference parity: its Dockerfile wrapped the TF GPU
# image).  For TPU VMs, start from a jax-ready base and install the package.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY probav_tpu ./probav_tpu
COPY cfg ./cfg
COPY train.py test.py evaluate.py data_generator.py bench.py ./

# On a TPU VM install jax[tpu] instead: pip install "jax[tpu]" -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir .[full]

ENTRYPOINT ["python3"]

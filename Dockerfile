# TPU host image (reference Dockerfile:5-38 was CUDA 11.1 + conda + DeepSpeed;
# the TPU-native stack needs only the jax[tpu] wheel set).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    git build-essential && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e .[dev]

ENTRYPOINT ["python", "-m", "satflow_tpu.run"]

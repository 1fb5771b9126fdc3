# Serving image for geoguessr-ai-tpu (reference: /root/reference/Dockerfile,
# which runs the broken main.py stub; this one serves the real engine).
FROM python:3.12-slim

WORKDIR /app

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ libjpeg-dev \
    && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml ./
COPY geoguessr_ai_tpu ./geoguessr_ai_tpu
COPY data/geocells/centroid_table.npz ./data/geocells/centroid_table.npz

# jax[tpu] is installed in TPU images; CPU fallback for local serving.
RUN pip install --no-cache-dir jax flax optax orbax-checkpoint einops \
    numpy pandas pillow fastapi "uvicorn[standard]" \
    && pip install --no-cache-dir -e .

EXPOSE 8000
CMD ["python", "-m", "geoguessr_ai_tpu.serving.api"]

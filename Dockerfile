# TPU serving image (the reference packages a CUDA RunPod image with baked
# checkpoints, Dockerfile:1-43; this is the TPU-VM equivalent).
FROM python:3.12-slim

ENV PYTHONUNBUFFERED=1 \
    SDTPU_MODEL_DIR=/models

WORKDIR /app

# TPU runtime: libtpu-enabled jax (pinned by the deployment environment)
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir optax orbax-checkpoint regex pillow

COPY stablediffusion_tpu/ /app/stablediffusion_tpu/
COPY pyproject.toml /app/
RUN pip install --no-cache-dir -e .

# Bake checkpoints/LoRAs into the image like the reference (Dockerfile:21-31):
# mount or COPY diffusers-layout folders under /models, e.g.
#   COPY models/sdxl_AnimaPencil /models/sdxl_AnimaPencil
#   COPY loras/ /models/
# Optional: halve checkpoint bytes with int8-on-disk weights first
#   (sdtpu-quantize models/sdxl_AnimaPencil models/sdxl_AnimaPencil_w8)
# Optional (on a TPU build host): bake the XLA compile cache so cold starts
# skip the first-request compile (measured 81.5 -> 15.2 s first image):
#   RUN python -m stablediffusion_tpu.serve.worker --model_name AnimaPencil \
#       --model_type sdxl --warmup --warmup_only

EXPOSE 8000
CMD ["python", "-m", "stablediffusion_tpu.serve.worker", "--port", "8000", \
     "--model_dir", "/models"]

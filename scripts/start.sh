#!/bin/sh
# Container start script (the runpod-worker/start.sh analog).
# Optional: export WANDB_API_KEY / SDTPU_MODEL_DIR before launch.
exec python -m stablediffusion_tpu.serve.worker \
  --port "${PORT:-8000}" \
  --model_dir "${SDTPU_MODEL_DIR:-/models}" \
  ${SDTPU_PRELOAD_MODEL:+--model_name "$SDTPU_PRELOAD_MODEL"}

from stablediffusion_tpu.io.safetensors_io import (
    load_safetensors,
    save_safetensors,
    SafetensorsFile,
)

from stablediffusion_tpu.lora.core import (
    TEXT_TARGET_SUFFIXES,
    UNET_TARGET_SUFFIXES,
    apply_lora_for_training,
    delta_w,
    fuse,
    init_lora,
    linear_module_paths,
    num_lora_params,
)
from stablediffusion_tpu.lora.formats import (
    load_lora_file,
    parse_lora_state_dict,
    save_lora_file,
    validate_lora_keys,
)

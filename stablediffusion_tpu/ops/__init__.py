from stablediffusion_tpu.ops.basic import (
    ACTIVATIONS,
    avg_pool_2x,
    conv2d,
    geglu,
    gelu,
    group_norm,
    group_norm_silu,
    interpolate_nearest,
    layer_norm,
    linear,
    quick_gelu,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)
from stablediffusion_tpu.ops.attention import attention, attention_xla

from stablediffusion_tpu.pipelines.unified import (
    SDPipelineOutput,
    StableDiffusionUnifiedPipeline,
)
from stablediffusion_tpu.pipelines.sd3 import (
    SD3Model,
    StableDiffusion3Pipeline,
)

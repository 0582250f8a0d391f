from stablediffusion_tpu.pipelines.unified import (
    SDPipelineOutput,
    StableDiffusionUnifiedPipeline,
)

"""stablediffusion_tpu — a TPU-native Stable Diffusion framework.

A brand-new JAX/XLA/Pallas implementation of the full capability surface of
the reference `GrafikXxxxxxxYyyyyyyyyyy/StableDiffusion` stack (see SURVEY.md):
SD1.5 / SDXL txt2img, img2img and inpainting through one unified pipeline,
eight noise schedulers, CLIP text encoding with clip-skip and SDXL
dual-encoder conditioning, LoRA load/fuse/train, diffusers-layout and
A1111/LDM checkpoint IO, data-parallel LoRA fine-tuning over a device mesh,
and a serverless-style request handler.

Design principles (TPU-first, not a port):
  * params are plain pytrees (nested dicts keyed like diffusers checkpoints)
    in canonical JAX layouts (conv kernels HWIO, linear kernels (in, out));
  * models are pure functions `apply(params, ...)`;
  * schedulers are stateless: a static plan + an explicit carry pytree, so a
    whole denoise run compiles into one `lax.scan`;
  * hot ops (attention, groupnorm+silu) have Pallas kernels with XLA
    reference fallbacks;
  * parallelism is `jax.sharding.Mesh` + NamedSharding, collectives ride ICI.
"""

__version__ = "0.1.0"

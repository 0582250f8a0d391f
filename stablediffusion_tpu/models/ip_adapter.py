"""IP-Adapter (arXiv 2308.06721) — image-prompt conditioning runtime.

Beyond-parity: the reference repo (GrafikX/StableDiffusion) has no
image-prompt path; diffusers' equivalent surface is
`pipe.load_ip_adapter(...)` / `set_ip_adapter_scale(...)` over the
h94/IP-Adapter checkpoint family.  Checkpoints carry two flat dicts:

  * ``image_proj``  — either the standard ImageProjModel (keys ``proj``,
    ``norm``) mapping the CLIP *projected* image embed to N=4 context tokens,
    or the IP-Adapter-Plus perceiver Resampler (keys ``latents``, ``proj_in``,
    ``proj_out``, ``norm_out``, ``layers.*``) over penultimate hidden states;
  * ``ip_adapter`` — per-cross-attention ``{idx}.to_k_ip/to_v_ip.weight``
    where ``idx`` = 2 * (cross-attn position) + 1 in diffusers'
    ``unet.attn_processors`` traversal order (down_blocks, up_blocks,
    mid_block — ModuleList attribute-creation order).

All weights are converted to TPU-canonical (in, out) layouts at load and the
``to_k_ip``/``to_v_ip`` kernels are fused into the UNet param tree at the
matching ``attn2`` nodes, so the jitted forward sees one pytree and the
decoupled attention stream compiles into the same fused program.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.config import UNetConfig
from stablediffusion_tpu.ops import attention, layer_norm, linear


# ---------------------------------------------------------------------------
# attn2 enumeration (diffusers attn_processors order: down, up, mid)
# ---------------------------------------------------------------------------


def cross_attn_paths(config: UNetConfig) -> List[Tuple[str, ...]]:
    """Paths of every attn2 node in the UNet param tree, in diffusers'
    ``attn_processors`` traversal order (down_blocks and up_blocks ModuleLists
    are created before mid_block, so mid enumerates LAST)."""
    paths: List[Tuple[str, ...]] = []
    L = config.layers_per_block
    for i, btype in enumerate(config.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(L):
            for t in range(config.tf_layers_for_block(i)):
                paths.append((
                    "down_blocks", str(i), "attentions", str(j),
                    "transformer_blocks", str(t), "attn2",
                ))
    n_blocks = len(config.block_out_channels)
    for i, btype in enumerate(config.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        for j in range(L + 1):
            for t in range(config.tf_layers_for_block(n_blocks - 1 - i)):
                paths.append((
                    "up_blocks", str(i), "attentions", str(j),
                    "transformer_blocks", str(t), "attn2",
                ))
    for t in range(config.tf_layers_for_block(n_blocks - 1)):
        paths.append((
            "mid_block", "attentions", "0", "transformer_blocks", str(t), "attn2",
        ))
    return paths


def fuse_ip_weights(
    unet_params: dict, config: UNetConfig, ip_sd: Dict[str, np.ndarray], dtype=None
) -> dict:
    """Insert to_k_ip/to_v_ip (converted to (in, out)) at each attn2 node.

    ``ip_sd`` is the flat ``ip_adapter`` dict in torch layout with keys
    ``{2*i+1}.to_k_ip.weight``.  Returns a new tree (input not mutated)."""
    paths = cross_attn_paths(config)
    n_found = 0
    # tree_map rebuilds every dict node, so in-place edits below are safe
    params = jax.tree_util.tree_map(lambda x: x, unet_params)

    def _node(tree: dict, path: Tuple[str, ...]) -> dict:
        node = tree
        for p in path:
            node = node[p]
        return node

    for i, path in enumerate(paths):
        key_id = 2 * i + 1
        kw = ip_sd.get(f"{key_id}.to_k_ip.weight")
        vw = ip_sd.get(f"{key_id}.to_v_ip.weight")
        if kw is None or vw is None:
            continue
        node = _node(params, path)
        cast = (lambda a: jnp.asarray(np.transpose(np.asarray(a)), dtype=dtype))
        node["to_k_ip"] = {"weight": cast(kw)}
        node["to_v_ip"] = {"weight": cast(vw)}
        n_found += 1
    if n_found != len(paths):
        raise ValueError(
            f"IP-Adapter weights matched {n_found}/{len(paths)} cross-attention "
            "layers — checkpoint does not fit this UNet config"
        )
    return params


def strip_ip_weights(unet_params: dict) -> dict:
    """Remove all to_k_ip/to_v_ip nodes (unload_ip_adapter)."""
    def _strip(node):
        if not isinstance(node, dict):
            return node
        return {
            k: _strip(v)
            for k, v in node.items()
            if k not in ("to_k_ip", "to_v_ip")
        }
    return _strip(unet_params)


# ---------------------------------------------------------------------------
# image projection models
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ImageProjConfig:
    kind: str  # "proj" (standard) | "resampler" (plus)
    num_tokens: int
    cross_attention_dim: int
    # resampler only
    dim: int = 0
    depth: int = 0
    heads: int = 0
    dim_head: int = 64
    embedding_dim: int = 0


def infer_image_proj_config(image_proj_sd: Dict[str, np.ndarray]) -> ImageProjConfig:
    """Shape-inferred config (air-gap-safe, like io/a1111.py does for UNets)."""
    if "proj.weight" in image_proj_sd:
        w = image_proj_sd["proj.weight"]  # torch (out, in) = (tokens*xdim, clip)
        norm = image_proj_sd["norm.weight"]
        xdim = int(norm.shape[0])
        return ImageProjConfig(
            kind="proj", num_tokens=int(w.shape[0]) // xdim, cross_attention_dim=xdim
        )
    if "latents" in image_proj_sd:
        latents = image_proj_sd["latents"]  # [1, num_queries, dim]
        proj_out = image_proj_sd["proj_out.weight"]  # (out_dim, dim)
        proj_in = image_proj_sd["proj_in.weight"]  # (dim, embedding_dim)
        to_q = image_proj_sd["layers.0.0.to_q.weight"]  # (inner, dim)
        depth = 0
        while f"layers.{depth}.0.to_q.weight" in image_proj_sd:
            depth += 1
        dim_head = 64
        inner = int(to_q.shape[0])
        return ImageProjConfig(
            kind="resampler",
            num_tokens=int(latents.shape[1]),
            cross_attention_dim=int(proj_out.shape[0]),
            dim=int(latents.shape[2]),
            depth=depth,
            heads=inner // dim_head,
            dim_head=dim_head,
            embedding_dim=int(proj_in.shape[1]),
        )
    raise ValueError(f"unrecognized image_proj keys: {sorted(image_proj_sd)[:8]}")


def convert_image_proj(image_proj_sd: Dict[str, np.ndarray], dtype=None) -> dict:
    """Torch-layout image_proj dict -> canonical nested pytree."""
    from stablediffusion_tpu.io.torch_convert import convert_state_dict

    # `latents` is a parameter, not a .weight linear — convert_state_dict only
    # transposes *.weight 2-D tensors, so it passes through unscathed.
    return convert_state_dict(image_proj_sd, dtype=dtype)


def image_proj_apply(
    params: dict, cfg: ImageProjConfig, image_embeds: jax.Array
) -> jax.Array:
    """Standard ImageProjModel: [B, clip_dim] -> [B, num_tokens, xdim]."""
    x = linear(params["proj"], image_embeds)
    x = x.reshape(x.shape[0], cfg.num_tokens, cfg.cross_attention_dim)
    return layer_norm(params["norm"], x)


def _perceiver_attention(
    p: dict, x: jax.Array, latents: jax.Array, heads: int, dim_head: int
) -> jax.Array:
    """PerceiverAttention (tencent-ailab ip_adapter/resampler.py semantics):
    q from latents, k/v from concat(x, latents); note the double-sqrt scaling
    applied to BOTH q and k (== 1/sqrt(d) overall)."""
    x = layer_norm(p["norm1"], x)
    lat = layer_norm(p["norm2"], latents)
    B, Nl, D = lat.shape
    q = linear(p["to_q"], lat)
    kv_in = jnp.concatenate([x, lat], axis=1)
    kv = linear(p["to_kv"], kv_in)
    k, v = jnp.split(kv, 2, axis=-1)
    inner = heads * dim_head
    q = q.reshape(B, Nl, heads, dim_head)
    k = k.reshape(B, kv_in.shape[1], heads, dim_head)
    v = v.reshape(B, kv_in.shape[1], heads, dim_head)
    out = attention(q, k, v, scale=dim_head**-0.5)
    return linear(p["to_out"], out.reshape(B, Nl, inner))


def resampler_apply(
    params: dict, cfg: ImageProjConfig, image_hidden: jax.Array
) -> jax.Array:
    """IP-Adapter-Plus Resampler: [B, S, embed_dim] penultimate CLIP hidden
    states -> [B, num_tokens, xdim]."""
    B = image_hidden.shape[0]
    latents = jnp.broadcast_to(
        params["latents"].astype(image_hidden.dtype), (B,) + params["latents"].shape[1:]
    )
    x = linear(params["proj_in"], image_hidden)
    for d in range(cfg.depth):
        lp = params["layers"][str(d)]
        latents = _perceiver_attention(
            lp["0"], x, latents, cfg.heads, cfg.dim_head
        ) + latents
        # FeedForward: LayerNorm -> Linear -> GELU -> Linear (Sequential 0,1,3)
        ff = lp["1"]
        h = layer_norm(ff["0"], latents)
        h = linear(ff["1"], h)
        h = jax.nn.gelu(h, approximate=False)
        latents = linear(ff["3"], h) + latents
    out = linear(params["proj_out"], latents)
    return layer_norm(params["norm_out"], out)


def project_image_embeds(
    params: dict, cfg: ImageProjConfig, feats: jax.Array
) -> jax.Array:
    """Dispatch: projected embeds (standard) or hidden states (plus)."""
    if cfg.kind == "proj":
        return image_proj_apply(params, cfg, feats)
    return resampler_apply(params, cfg, feats)


# ---------------------------------------------------------------------------
# checkpoint IO
# ---------------------------------------------------------------------------


def load_ip_adapter_file(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Read an IP-Adapter checkpoint (.safetensors with ``image_proj.`` /
    ``ip_adapter.`` key prefixes, or torch .bin with two nested dicts).
    Returns flat torch-layout (image_proj_sd, ip_adapter_sd)."""
    if path.endswith(".safetensors"):
        from stablediffusion_tpu.io.safetensors_io import load_safetensors

        flat = load_safetensors(path)
        image_proj = {
            k[len("image_proj."):]: np.asarray(v)
            for k, v in flat.items()
            if k.startswith("image_proj.")
        }
        ip = {
            k[len("ip_adapter."):]: np.asarray(v)
            for k, v in flat.items()
            if k.startswith("ip_adapter.")
        }
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        image_proj = {k: v.float().numpy() for k, v in sd["image_proj"].items()}
        ip = {k: v.float().numpy() for k, v in sd["ip_adapter"].items()}
    if not image_proj or not ip:
        raise ValueError(f"{path}: missing image_proj/ip_adapter groups")
    return image_proj, ip


@dataclass
class IPAdapter:
    """Loaded IP-Adapter state held by the model wrapper."""

    config: ImageProjConfig
    image_proj_params: dict
    num_tokens: int

    @classmethod
    def load(cls, path: str, dtype=None) -> Tuple["IPAdapter", Dict[str, np.ndarray]]:
        image_proj_sd, ip_sd = load_ip_adapter_file(path)
        cfg = infer_image_proj_config(image_proj_sd)
        proj_params = convert_image_proj(image_proj_sd, dtype=dtype)
        return cls(cfg, proj_params, cfg.num_tokens), ip_sd

"""Independent torch mirror of diffusers' UNet2DConditionModel / AutoencoderKL.

External numeric anchor for models/unet.py and models/vae.py: a from-scratch
torch (NCHW, (out,in)-linear) implementation of the *published* diffusers
block wiring — resnet prologue order, Transformer2D projection conventions,
skip-connection pop order, micro-conditioning concat order, VAE asymmetric
downsample padding.  State-dict keys follow the diffusers checkpoint naming,
so the mirror's weights flow through the REAL converter
(io/torch_convert.convert_state_dict) into our param pytrees; a transpose or
wiring error on either side breaks the allclose in test_torch_mirror.py.

Written against the reference's bound model semantics
(/root/reference/models/stable_diffusion.py:113-123, forward calls at
/root/reference/pipelines/sd_unified_pipeline.py:465-523) — NOT a port of
stablediffusion_tpu/models/*.py; keep it that way or the anchor is circular.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(
    timesteps: torch.Tensor,
    dim: int,
    flip_sin_to_cos: bool,
    downscale_freq_shift: float,
    max_period: float = 10000.0,
) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = torch.exp(exponent)[None, :] * timesteps.float()[:, None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, out_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, out_dim)
        self.linear_2 = nn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, c_in, c_out, temb_dim, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=eps)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, c_out)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=eps)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, bias=False):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=bias)
        self.to_k = nn.Linear(context_dim, query_dim, bias=bias)
        self.to_v = nn.Linear(context_dim, query_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        B, S, C = x.shape
        h, d = self.heads, C // self.heads
        q = self.to_q(x).view(B, S, h, d).transpose(1, 2)
        k = self.to_k(context).view(B, context.shape[1], h, d).transpose(1, 2)
        v = self.to_v(context).view(B, context.shape[1], h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(B, S, C)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(dim, 4 * dim), nn.Identity(), nn.Linear(4 * dim, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, context_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, dim, context_dim, heads, n_layers, groups, use_linear):
        super().__init__()
        self.use_linear = use_linear
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        proj = (lambda: nn.Linear(dim, dim)) if use_linear else (
            lambda: nn.Conv2d(dim, dim, 1)
        )
        self.proj_in = proj()
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, context_dim, heads) for _ in range(n_layers)]
        )
        self.proj_out = proj()

    def forward(self, x, context):
        B, C, H, W = x.shape
        residual = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        for block in self.transformer_blocks:
            h = block(h, context)
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return h + residual


class Downsample2D(nn.Module):
    """stride-2 conv; VAE encoder uses padding=0 + asymmetric (0,1,0,1) pad."""

    def __init__(self, c, pad: int):
        super().__init__()
        self.pad = pad
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.pad == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class MirrorUNet(nn.Module):
    """UNet2DConditionModel wiring at an arbitrary (tiny) UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        temb = cfg.time_embed_dim
        L = cfg.layers_per_block
        n = len(ch)

        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch[0], temb)
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = TimestepEmbedding(
                cfg.projection_class_embeddings_input_dim, temb
            )

        def make_tf(c, i):
            return Transformer2DModel(
                c, cfg.cross_attention_dim, cfg.heads_for_block(i),
                cfg.tf_layers_for_block(i), cfg.norm_num_groups,
                cfg.use_linear_projection,
            )

        self.down_blocks = nn.ModuleList()
        c_in = ch[0]
        for i, btype in enumerate(cfg.down_block_types):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock2D(c_in if j == 0 else ch[i], ch[i], temb,
                               cfg.norm_num_groups, cfg.norm_eps)
                 for j in range(L)]
            )
            if btype == "CrossAttnDownBlock2D":
                blk.attentions = nn.ModuleList([make_tf(ch[i], i) for _ in range(L)])
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(ch[i], pad=1)])
            self.down_blocks.append(blk)
            c_in = ch[i]

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(ch[-1], ch[-1], temb, cfg.norm_num_groups, cfg.norm_eps)
             for _ in range(2)]
        )
        self.mid_block.attentions = nn.ModuleList([make_tf(ch[-1], n - 1)])

        # skip-channel bookkeeping mirrors the down pass exactly
        skip_channels = [ch[0]]
        for i in range(n):
            skip_channels += [ch[i]] * L
            if i < n - 1:
                skip_channels.append(ch[i])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        prev_c = ch[-1]
        for i, btype in enumerate(cfg.up_block_types):
            c = rev[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            attns = []
            for j in range(L + 1):
                skip_c = skip_channels.pop()
                blk.resnets.append(
                    ResnetBlock2D(prev_c + skip_c, c, temb,
                                  cfg.norm_num_groups, cfg.norm_eps)
                )
                if btype == "CrossAttnUpBlock2D":
                    attns.append(make_tf(c, n - 1 - i))
                prev_c = c
            if attns:
                blk.attentions = nn.ModuleList(attns)
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(c)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, ch[0], eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states,
                text_embeds=None, time_ids=None):
        cfg = self.cfg
        B = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(B)
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift,
        )
        emb = self.time_embedding(t_emb)
        if cfg.addition_embed_type == "text_time":
            t_flat = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift,
            ).reshape(B, -1)
            emb = emb + self.add_embedding(
                torch.cat([text_embeds, t_flat], dim=-1)
            )

        x = self.conv_in(sample)
        skips = [x]
        for i, (btype, blk) in enumerate(zip(cfg.down_block_types, self.down_blocks)):
            for j, resnet in enumerate(blk.resnets):
                x = resnet(x, emb)
                if btype == "CrossAttnDownBlock2D":
                    x = blk.attentions[j](x, encoder_hidden_states)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, emb)
        x = self.mid_block.attentions[0](x, encoder_hidden_states)
        x = self.mid_block.resnets[1](x, emb)

        for i, (btype, blk) in enumerate(zip(cfg.up_block_types, self.up_blocks)):
            for j, resnet in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = resnet(x, emb)
                if btype == "CrossAttnUpBlock2D":
                    x = blk.attentions[j](x, encoder_hidden_states)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    """Single-head full-channel mid-block attention (diffusers Attention with
    group_norm, residual add)."""

    def __init__(self, c, groups, eps):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=eps)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x)
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C), dim=-1)
        o = self.to_out[0](attn @ v)
        return x + o.reshape(B, H, W, C).permute(0, 3, 1, 2)


class VAEMidBlock(nn.Module):
    def __init__(self, c, groups, eps):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(c, c, None, groups, eps) for _ in range(2)]
        )
        self.attentions = nn.ModuleList([VAEAttention(c, groups, eps)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class MirrorVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        g, eps, L = cfg.norm_num_groups, cfg.norm_eps, cfg.layers_per_block
        lc = cfg.latent_channels
        n = len(ch)

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        c_in = ch[0]
        for i, c in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock2D(c_in if j == 0 else c, c, None, g, eps)
                 for j in range(L)]
            )
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(c, pad=0)])
            enc.down_blocks.append(blk)
            c_in = c
        enc.mid_block = VAEMidBlock(ch[-1], g, eps)
        enc.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=eps)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * lc, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * lc, 2 * lc, 1)
        self.post_quant_conv = nn.Conv2d(lc, lc, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(lc, ch[-1], 3, padding=1)
        dec.mid_block = VAEMidBlock(ch[-1], g, eps)
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        c_in = rev[0]
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock2D(c_in if j == 0 else c, c, None, g, eps)
                 for j in range(L + 1)]
            )
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(c)])
            dec.up_blocks.append(blk)
            c_in = c
        dec.conv_norm_out = nn.GroupNorm(g, rev[-1], eps=eps)
        dec.conv_out = nn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)
        self.decoder = dec

    def encode(self, image):
        e = self.encoder
        x = e.conv_in(image)
        for blk in e.down_blocks:
            for resnet in blk.resnets:
                x = resnet(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = e.mid_block(x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        moments = self.quant_conv(x)
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, latents):
        d = self.decoder
        x = self.post_quant_conv(latents)
        x = d.conv_in(x)
        x = d.mid_block(x)
        for blk in d.up_blocks:
            for resnet in blk.resnets:
                x = resnet(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))

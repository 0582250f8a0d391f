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


# ---------------------------------------------------------------------------
# SD3 MM-DiT mirror (SD3Transformer2DModel wiring, arXiv 2403.03206)
# ---------------------------------------------------------------------------


class MirrorAdaLNZero(nn.Module):
    def __init__(self, dim, n_chunks=6):
        super().__init__()
        self.linear = nn.Linear(dim, n_chunks * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.n_chunks = n_chunks

    def forward(self, x, emb):
        mod = self.linear(F.silu(emb))
        chunks = mod.chunk(self.n_chunks, dim=-1)
        if self.n_chunks == 2:  # AdaLayerNormContinuous: (scale, shift)
            scale, shift = chunks
            return self.norm(x) * (1 + scale[:, None]) + shift[:, None], ()
        if self.n_chunks == 9:  # AdaLayerNormZeroX (MMDiT-X dual attention)
            (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
             shift_msa2, scale_msa2, gate_msa2) = chunks
            n = self.norm(x)
            h = n * (1 + scale_msa[:, None]) + shift_msa[:, None]
            h2 = n * (1 + scale_msa2[:, None]) + shift_msa2[:, None]
            return h, (gate_msa, shift_mlp, scale_mlp, gate_mlp, h2, gate_msa2)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = chunks
        h = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, (gate_msa, shift_mlp, scale_mlp, gate_mlp)


class MirrorJointBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, last, qk_norm=None, dual=False):
        super().__init__()
        self.heads, self.head_dim, self.last = heads, head_dim, last
        self.dual = dual
        self.norm1 = MirrorAdaLNZero(dim, 9 if dual else 6)
        self.norm1_context = MirrorAdaLNZero(dim, 2 if last else 6)
        attn = nn.Module()
        attn.to_q = nn.Linear(dim, dim)
        attn.to_k = nn.Linear(dim, dim)
        attn.to_v = nn.Linear(dim, dim)
        attn.add_q_proj = nn.Linear(dim, dim)
        attn.add_k_proj = nn.Linear(dim, dim)
        attn.add_v_proj = nn.Linear(dim, dim)
        attn.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if not last:
            attn.to_add_out = nn.Linear(dim, dim)
        if qk_norm == "rms_norm":
            attn.norm_q = nn.RMSNorm(head_dim, eps=1e-6)
            attn.norm_k = nn.RMSNorm(head_dim, eps=1e-6)
            attn.norm_added_q = nn.RMSNorm(head_dim, eps=1e-6)
            attn.norm_added_k = nn.RMSNorm(head_dim, eps=1e-6)
        self.attn = attn
        self.qk_norm = qk_norm
        if dual:
            attn2 = nn.Module()
            attn2.to_q = nn.Linear(dim, dim)
            attn2.to_k = nn.Linear(dim, dim)
            attn2.to_v = nn.Linear(dim, dim)
            attn2.to_out = nn.ModuleList([nn.Linear(dim, dim)])
            if qk_norm == "rms_norm":
                attn2.norm_q = nn.RMSNorm(head_dim, eps=1e-6)
                attn2.norm_k = nn.RMSNorm(head_dim, eps=1e-6)
            self.attn2 = attn2

        def ff(dim):
            m = nn.Module()
            proj_wrap = nn.Module()
            proj_wrap.proj = nn.Linear(dim, 4 * dim)
            m.net = nn.ModuleList([proj_wrap, nn.Identity(), nn.Linear(4 * dim, dim)])
            return m

        self.ff = ff(dim)
        if not last:
            self.ff_context = ff(dim)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        if not last:
            self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def _heads(self, t):
        B, S, _ = t.shape
        return t.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, x, ctx, emb):
        a = self.attn
        if self.dual:
            x_n, (g_msa, sh_mlp, sc_mlp, g_mlp, x_n2, g_msa2) = self.norm1(
                x, emb
            )
        else:
            x_n, (g_msa, sh_mlp, sc_mlp, g_mlp) = self.norm1(x, emb)
        if self.last:
            ctx_n, _ = self.norm1_context(ctx, emb)
            c_gates = None
        else:
            ctx_n, c_gates = self.norm1_context(ctx, emb)

        q = self._heads(a.to_q(x_n))
        k = self._heads(a.to_k(x_n))
        v = self._heads(a.to_v(x_n))
        qc = self._heads(a.add_q_proj(ctx_n))
        kc = self._heads(a.add_k_proj(ctx_n))
        vc = self._heads(a.add_v_proj(ctx_n))
        if self.qk_norm == "rms_norm":
            q, k = a.norm_q(q), a.norm_k(k)
            qc, kc = a.norm_added_q(qc), a.norm_added_k(kc)
        S = x.shape[1]
        q = torch.cat([q, qc], dim=2)
        k = torch.cat([k, kc], dim=2)
        v = torch.cat([v, vc], dim=2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(x.shape[0], -1, self.heads * self.head_dim)
        o_img, o_ctx = o[:, :S], o[:, S:]
        x = x + g_msa[:, None] * a.to_out[0](o_img)
        if self.dual:
            a2 = self.attn2
            q2 = self._heads(a2.to_q(x_n2))
            k2 = self._heads(a2.to_k(x_n2))
            v2 = self._heads(a2.to_v(x_n2))
            if self.qk_norm == "rms_norm":
                q2, k2 = a2.norm_q(q2), a2.norm_k(k2)
            o2 = F.scaled_dot_product_attention(q2, k2, v2)
            o2 = o2.transpose(1, 2).reshape(
                x.shape[0], -1, self.heads * self.head_dim
            )
            x = x + g_msa2[:, None] * a2.to_out[0](o2)
        h = self.norm2(x) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        x = x + g_mlp[:, None] * self.ff.net[2](
            F.gelu(self.ff.net[0].proj(h), approximate="tanh")
        )
        if self.last:
            return x, None
        c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = c_gates
        ctx = ctx + c_g_msa[:, None] * a.to_add_out(o_ctx)
        hc = self.norm2_context(ctx) * (1 + c_sc_mlp[:, None]) + c_sh_mlp[:, None]
        ctx = ctx + c_g_mlp[:, None] * self.ff_context.net[2](
            F.gelu(self.ff_context.net[0].proj(hc), approximate="tanh")
        )
        return x, ctx


class MirrorMMDiT(nn.Module):
    """From-scratch SD3Transformer2DModel (NCHW, torch layouts, diffusers
    checkpoint keys) — anchors models/mmdit.py through the real converter."""

    def __init__(self, cfg):
        super().__init__()
        D = cfg.num_attention_heads * cfg.attention_head_dim
        self.cfg = cfg
        pos = nn.Module()
        pos.proj = nn.Conv2d(cfg.in_channels, D, cfg.patch_size, stride=cfg.patch_size)
        pos.register_buffer(
            "pos_embed",
            torch.randn(1, cfg.pos_embed_max_size**2, D) * 0.02,
        )
        self.pos_embed = pos

        tte = nn.Module()
        t_e = nn.Module()
        t_e.linear_1 = nn.Linear(256, D)
        t_e.linear_2 = nn.Linear(D, D)
        tte.timestep_embedder = t_e
        x_e = nn.Module()
        x_e.linear_1 = nn.Linear(cfg.pooled_projection_dim, D)
        x_e.linear_2 = nn.Linear(D, D)
        tte.text_embedder = x_e
        self.time_text_embed = tte

        self.context_embedder = nn.Linear(cfg.joint_attention_dim, D)
        self.transformer_blocks = nn.ModuleList(
            [
                MirrorJointBlock(
                    D, cfg.num_attention_heads, cfg.attention_head_dim,
                    last=(i == cfg.num_layers - 1), qk_norm=cfg.qk_norm,
                    dual=(i in getattr(cfg, "dual_attention_layers", ())),
                )
                for i in range(cfg.num_layers)
            ]
        )
        self.norm_out = MirrorAdaLNZero(D, 2)
        self.proj_out = nn.Linear(D, cfg.patch_size**2 * cfg.out_channels)

    def forward(self, sample, timestep, encoder_hidden_states, pooled):
        cfg = self.cfg
        B, _, H, W = sample.shape
        p = cfg.patch_size
        h, w = H // p, W // p
        x = self.pos_embed.proj(sample)  # [B, D, h, w]
        x = x.flatten(2).transpose(1, 2)
        m = cfg.pos_embed_max_size
        top, left = (m - h) // 2, (m - w) // 2
        grid = self.pos_embed.pos_embed.view(1, m, m, -1)
        x = x + grid[:, top : top + h, left : left + w].reshape(1, h * w, -1)

        t_freq = timestep_embedding(timestep, 256, True, 0.0)
        te = self.time_text_embed.timestep_embedder
        temb = te.linear_2(F.silu(te.linear_1(t_freq)))
        xe = self.time_text_embed.text_embedder
        temb = temb + xe.linear_2(F.silu(xe.linear_1(pooled)))

        ctx = self.context_embedder(encoder_hidden_states)
        for blk in self.transformer_blocks:
            x, ctx = blk(x, ctx, temb)
        x, _ = self.norm_out(x, temb)
        x = self.proj_out(x)
        x = x.view(B, h, w, p, p, cfg.out_channels)
        x = x.permute(0, 5, 1, 3, 2, 4).reshape(B, cfg.out_channels, H, W)
        return x


# ---------------------------------------------------------------------------
# ControlNet (diffusers ControlNetModel — Zhang et al. 2023)
# ---------------------------------------------------------------------------


class ControlNetConditioningEmbedding(nn.Module):
    """Pixel-space control image -> latent-res features: conv_in, then per
    channel step one stride-1 and one stride-2 conv (all SiLU), then conv_out
    (diffusers ControlNetConditioningEmbedding; conv_out is zero-init there,
    random here so the anchor compares real numerics)."""

    def __init__(self, out_channels, cond_channels=(16, 32, 96, 256)):
        super().__init__()
        ch = cond_channels
        self.conv_in = nn.Conv2d(3, ch[0], 3, padding=1)
        blocks = []
        for i in range(len(ch) - 1):
            blocks.append(nn.Conv2d(ch[i], ch[i], 3, padding=1))
            blocks.append(nn.Conv2d(ch[i], ch[i + 1], 3, padding=1, stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(ch[-1], out_channels, 3, padding=1)

    def forward(self, cond):
        x = F.silu(self.conv_in(cond))
        for block in self.blocks:
            x = F.silu(block(x))
        return self.conv_out(x)


class MirrorControlNet(nn.Module):
    """ControlNetModel wiring: the UNet's encoder trunk (conv_in,
    time/add embedding, down_blocks, mid_block — borrowed module-for-module
    from MirrorUNet so the state-dict keys match the diffusers checkpoint
    layout), a conditioning embedder added to conv_in's output, and one 1x1
    projection per skip plus one for the mid state.  diffusers zero-inits the
    projections; the mirror leaves them random so the comparison is
    non-trivial."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        trunk = MirrorUNet(cfg)
        self.conv_in = trunk.conv_in
        self.time_embedding = trunk.time_embedding
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = trunk.add_embedding
        self.down_blocks = trunk.down_blocks
        self.mid_block = trunk.mid_block

        ch = cfg.block_out_channels
        L = cfg.layers_per_block
        n = len(ch)
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(ch[0])
        skip_channels = [ch[0]]
        for i in range(n):
            skip_channels += [ch[i]] * L
            if i < n - 1:
                skip_channels.append(ch[i])
        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in skip_channels]
        )
        self.controlnet_mid_block = nn.Conv2d(ch[-1], ch[-1], 1)

    def forward(self, sample, timesteps, encoder_hidden_states, cond,
                conditioning_scale=1.0, text_embeds=None, time_ids=None):
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

        x = self.conv_in(sample) + self.controlnet_cond_embedding(cond)
        skips = [x]
        for btype, blk in zip(cfg.down_block_types, self.down_blocks):
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

        down_res = [
            proj(s) * conditioning_scale
            for proj, s in zip(self.controlnet_down_blocks, skips)
        ]
        mid_res = self.controlnet_mid_block(x) * conditioning_scale
        return down_res, mid_res


# ---------------------------------------------------------------------------
# IP-Adapter-Plus Resampler (tencent-ailab ip_adapter/resampler.py semantics,
# h94 checkpoint key layout)
# ---------------------------------------------------------------------------


class MirrorPerceiverAttention(nn.Module):
    def __init__(self, dim, dim_head, heads):
        super().__init__()
        self.dim_head, self.heads = dim_head, heads
        inner = dim_head * heads
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, latents):
        x = self.norm1(x)
        latents = self.norm2(latents)
        B, Nl, _ = latents.shape
        q = self.to_q(latents)
        kv_in = torch.cat([x, latents], dim=1)
        k, v = self.to_kv(kv_in).chunk(2, dim=-1)

        def heads_first(t):
            return t.view(B, t.shape[1], self.heads, self.dim_head).transpose(1, 2)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        # the published double-sqrt scaling: both q and k by dim_head**-0.25
        scale = 1.0 / math.sqrt(math.sqrt(self.dim_head))
        weight = (q * scale) @ (k * scale).transpose(-2, -1)
        attn = weight.softmax(dim=-1)
        out = attn @ v
        out = out.transpose(1, 2).reshape(B, Nl, self.heads * self.dim_head)
        return self.to_out(out)


class MirrorResampler(nn.Module):
    """Perceiver resampler: learned latents cross-attend to CLIP penultimate
    hidden states; keys match the h94 IP-Adapter-Plus image_proj layout
    (latents, proj_in, proj_out, norm_out, layers.{d}.{0,1})."""

    def __init__(self, dim, depth, dim_head, heads, num_queries,
                 embedding_dim, output_dim, ff_mult=4):
        super().__init__()
        self.latents = nn.Parameter(torch.randn(1, num_queries, dim) / dim**0.5)
        self.proj_in = nn.Linear(embedding_dim, dim)
        self.proj_out = nn.Linear(dim, output_dim)
        self.norm_out = nn.LayerNorm(output_dim)
        self.layers = nn.ModuleList()
        for _ in range(depth):
            ff = nn.Sequential(
                nn.LayerNorm(dim),
                nn.Linear(dim, dim * ff_mult, bias=False),
                nn.GELU(),
                nn.Linear(dim * ff_mult, dim, bias=False),
            )
            self.layers.append(
                nn.ModuleList([MirrorPerceiverAttention(dim, dim_head, heads), ff])
            )

    def forward(self, x):
        latents = self.latents.repeat(x.shape[0], 1, 1)
        x = self.proj_in(x)
        for attn, ff in self.layers:
            latents = attn(x, latents) + latents
            latents = ff(latents) + latents
        return self.norm_out(self.proj_out(latents))

"""Op parity tests vs torch (CPU) — the numeric anchors for model parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from stablediffusion_tpu.ops import (
    attention_xla,
    conv2d,
    group_norm,
    layer_norm,
    linear,
    quick_gelu,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
    interpolate_nearest,
)


def test_linear_vs_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    ours = linear({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w.T), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_conv2d_vs_torch(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)  # NHWC
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)  # HWIO
    b = rng.standard_normal((6,)).astype(np.float32)
    ours = conv2d(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x), padding=1
    )
    # torch: NCHW / OIHW
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    theirs = F.conv2d(xt, wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    # strided (downsampler)
    ours2 = conv2d({"weight": jnp.asarray(w)}, jnp.asarray(x), stride=2, padding=1)
    theirs2 = F.conv2d(xt, wt, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(ours2), theirs2.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_group_norm_vs_torch(rng):
    x = rng.standard_normal((2, 4, 4, 32)).astype(np.float32)
    w = rng.standard_normal((32,)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    ours = group_norm(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
        jnp.asarray(x),
        num_groups=8,
        eps=1e-5,
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    theirs = F.group_norm(xt, 8, torch.from_numpy(w), torch.from_numpy(b), eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_layer_norm_vs_torch(rng):
    x = rng.standard_normal((2, 7, 24)).astype(np.float32)
    w = rng.standard_normal((24,)).astype(np.float32)
    b = rng.standard_normal((24,)).astype(np.float32)
    ours = layer_norm(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x)
    )
    theirs = F.layer_norm(
        torch.from_numpy(x), (24,), torch.from_numpy(w), torch.from_numpy(b)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_attention_vs_torch_sdpa(rng):
    B, Sq, Skv, H, D = 2, 16, 9, 4, 8
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Skv, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Skv, H, D)).astype(np.float32)
    ours = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    # torch SDPA: [B, H, S, D]
    qt, kt, vt = (
        torch.from_numpy(a.transpose(0, 2, 1, 3)) for a in (q, k, v)
    )
    theirs = F.scaled_dot_product_attention(qt, kt, vt)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 1, 3), atol=1e-5
    )


def test_attention_causal_mask(rng):
    B, S, H, D = 1, 6, 2, 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    mask = jnp.where(
        jnp.tril(jnp.ones((S, S), bool)), 0.0, -jnp.inf
    )[None, None]
    ours = attention_xla(q, q, q, mask=mask)
    qt = torch.from_numpy(np.asarray(q).transpose(0, 2, 1, 3))
    theirs = F.scaled_dot_product_attention(qt, qt, qt, is_causal=True)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 1, 3), atol=1e-5
    )


def test_quick_gelu_matches_transformers():
    from transformers.activations import ACT2FN

    x = np.linspace(-3, 3, 101).astype(np.float32)
    ours = quick_gelu(jnp.asarray(x))
    theirs = ACT2FN["quick_gelu"](torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_timestep_embedding_properties():
    emb = timestep_embedding(jnp.asarray([0.0, 1.0, 500.0]), 320)
    assert emb.shape == (3, 320)
    # t=0: cos part = 1, sin part = 0 (flip_sin_to_cos -> [cos, sin])
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


def test_upsample_and_resize():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 2, 2, 4)
    up = upsample_nearest_2x(x)
    assert up.shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(up[0, :2, :2, 0]), np.asarray(x[0, 0, 0, 0]))
    down = interpolate_nearest(up, 2, 2)
    np.testing.assert_array_equal(np.asarray(down), np.asarray(x))


def test_flash_streaming_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    from stablediffusion_tpu.ops.flash_attention import flash_attention_streaming

    B, S, H, D = 1, 2048, 4, 40  # multi-kv-block path (bkv=1024)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    ref = attention_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_streaming(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_streaming_vae_head_shape(rng):
    """The streaming kernel's default regime: single-head D=512 long-KV
    attention (VAE mid-block at high-res decode) that the library flash
    kernel (D<=128) cannot tile and XLA cannot fit past ~8k tokens."""
    from jax.experimental.pallas import tpu as pltpu

    from stablediffusion_tpu.ops.flash_attention import flash_attention_streaming

    B, S, H, D = 1, 2048, 1, 512
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    ref = attention_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_streaming(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_attention_dispatch_routing(monkeypatch):
    """The shape->kernel routing table (ops/attention.attention), checked
    without hardware by faking _on_tpu and intercepting the kernel entries.
    Regimes (benchmarks/bench_longkv_attention.py, sweep_attention.py):
      * short KV (cross-attn)       -> XLA fusion
      * D>=64 self-attn S>=1024     -> library flash
      * batch<=2 or S>=8192, D>=32  -> library flash (floor drops to 32);
        big-batch D=40 at S<8192 stays XLA: in-graph XLA loop-fuses the
        whole attention at ~50 TF/s (round-4 trace), beating the kernel
      * S>=8192 with D outside [32,128] (VAE mid-block) -> streaming kernel
    """
    import importlib

    # the ops package re-exports the `attention` FUNCTION under the same
    # name as the submodule; go through importlib for the module itself
    A = importlib.import_module("stablediffusion_tpu.ops.attention")

    calls = []
    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        A, "_lib_flash", lambda q, k, v, s: calls.append("lib") or q
    )
    monkeypatch.setattr(
        A, "attention_xla",
        lambda q, k, v, mask=None, scale=None: calls.append("xla") or q,
    )

    import stablediffusion_tpu.ops.flash_attention as FA

    monkeypatch.setattr(
        FA, "flash_attention_streaming",
        lambda q, k, v, scale=None: calls.append("stream") or q,
    )

    def route(B, S, H, D, Skv=None):
        calls.clear()
        q = jnp.zeros((B, S, H, D), jnp.bfloat16)
        kv = jnp.zeros((B, Skv if Skv else S, H, D), jnp.bfloat16)
        A.attention(q, kv, kv)
        return calls[0]

    assert route(16, 4096, 8, 40) == "xla"        # SD15 L1 big batch: XLA
    #   loop-fuses whole softmax(QK^T)V in-graph at 50 TF/s (r4 trace) —
    #   beats the lib kernel there; standalone microbenches mislead
    assert route(16, 4096, 8, 40, Skv=77) == "xla"  # cross-attn short KV
    assert route(8, 4096, 10, 64) == "lib"        # SDXL L1
    assert route(2, 4096, 8, 40) == "lib"         # latency batch, floor 32
    assert route(2, 1024, 8, 80) == "lib"         # SD15 L2 latency batch
    assert route(16, 9216, 8, 40) == "lib"        # long KV drops floor
    assert route(1, 16384, 1, 512) == "stream"    # VAE mid-block high-res
    assert route(1, 4096, 1, 512) == "xla"        # VAE mid-block 512² decode

    # force flag: any >=2048 KV through the streaming kernel
    monkeypatch.setenv("SDTPU_PALLAS_ATTN", "1")
    assert route(16, 4096, 8, 40) == "stream"
    monkeypatch.delenv("SDTPU_PALLAS_ATTN")

    # kill switch: XLA everywhere
    monkeypatch.setenv("SDTPU_FLASH_ATTN", "0")
    assert route(8, 4096, 10, 64) == "xla"


def test_ragged_pad_granularity():
    """Adaptive tile granularity for ragged flash sequences: 512 when it
    wastes <=12.5%, else 256 — SD3 1024² joint (4429) keeps its measured
    512 config, SD3 512² joint (1101) pads to 1280 not 1536.  The floor is
    256: 128-token blocks measurably ballooned the flash backward's live
    set (17.12G vs 15.97G on the SD3 batch-16 step)."""
    from stablediffusion_tpu.ops.attention import _pad_granularity as gran

    assert gran(4429) == 512   # pads to 4608 (4%)
    assert gran(1101) == 256   # pads to 1280 (16%) — was 1536 (40%)
    assert gran(4096) == 512   # exact multiple, no pad
    assert gran(1024) == 512

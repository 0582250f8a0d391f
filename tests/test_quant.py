"""int8 quantization (ops/quant.py) — numerics, tree transform, SDModel
lifecycle, serving surface.

The reference has no quantized path (fp16 torch serving,
sd_unified_pipeline.py:465-523); this is a TPU-native opt-in extension, so
the anchors here are mathematical (exactness on integer-representable
weights, bounded relative error on random ones) rather than cross-framework.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stablediffusion_tpu.ops import basic
from stablediffusion_tpu.ops.quant import (
    int8_conv2d,
    int8_linear,
    quantize_params,
    quantize_weight,
)

from helpers import make_tiny_model


def test_weight_quant_exact_on_grid():
    # weights of the form s * g (g integer, per-column max |g| = 127) sit
    # exactly on the int8 grid: scale resolves to s and round(g) is exact
    g = np.random.default_rng(0).integers(-126, 127, (16, 8)).astype(np.float32)
    g[0, :] = 127.0  # pin every column's amax so scale == s exactly
    s = 0.03125  # power of two: s * 127 / 127 == s in fp
    w = jnp.asarray(s * g, jnp.float32)
    wq, scale = quantize_weight(w, (0,))
    np.testing.assert_allclose(np.asarray(scale).ravel(), s, rtol=0)
    back = wq.astype(jnp.float32) * scale
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), rtol=1e-6)


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_int8_linear_close_to_fp(mode):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 37, 64)), jnp.float32)
    params = {
        "weight": jnp.asarray(rng.standard_normal((64, 48)) * 0.05,
                              jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((48,)) * 0.01, jnp.float32),
    }
    ref = basic.linear(params, x)
    qtree = quantize_params({"m": params}, mode, min_size=1)["m"]
    assert "weight" not in qtree and "weight_int8" in qtree
    out = int8_linear(qtree, x)
    err = np.abs(np.asarray(out - ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert err < 0.02, f"{mode}: rel err {err}"


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_int8_conv_close_to_fp(mode):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    params = {
        "weight": jnp.asarray(rng.standard_normal((3, 3, 16, 24)) * 0.05,
                              jnp.float32),
        "bias": jnp.zeros((24,), jnp.float32),
    }
    ref = basic.conv2d(params, x)
    qtree = quantize_params({"m": params}, mode, min_size=1)["m"]
    out = int8_conv2d(qtree, x, stride=1, padding="SAME")
    err = np.abs(np.asarray(out - ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert err < 0.03, f"{mode}: rel err {err}"


def test_basic_ops_autodetect_quantized_tree():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    params = {"weight": jnp.asarray(rng.standard_normal((32, 32)) * 0.1,
                                    jnp.float32)}
    q = quantize_params({"m": params}, "w8a8", min_size=1)["m"]
    # the SAME primitive runs either tree — no model code branches
    np.testing.assert_allclose(
        np.asarray(basic.linear(q, x)), np.asarray(int8_linear(q, x)))


def test_quantize_params_skip_rules():
    rng = np.random.default_rng(4)

    def wdict(shape):
        return {"weight": jnp.asarray(rng.standard_normal(shape), jnp.float32)}

    tree = {
        "conv_in": wdict((3, 3, 4, 320)),          # boundary conv: skipped
        "norm1": wdict((320,)),                     # 1-D: skipped
        "time_embedding": {"linear_1": wdict((320, 1280))},  # skipped by key
        "attn": {"to_q": wdict((320, 320))},        # quantized
        "ff": {"proj": wdict((320, 2560))},         # quantized
        "tiny": wdict((8, 8)),                      # below min_size: skipped
    }
    q = quantize_params(tree, "w8a8", min_size=65536)
    assert "weight" in q["conv_in"] and "weight_int8" not in q["conv_in"]
    assert "weight" in q["norm1"]
    assert "weight" in q["time_embedding"]["linear_1"]
    assert "weight_int8" in q["attn"]["to_q"]
    assert "w8a8_scale" in q["ff"]["proj"]
    assert "weight" in q["tiny"]
    # the transformed tree is still a valid jit argument (no string leaves)
    jax.jit(lambda t: t["attn"]["to_q"]["weight_int8"].sum())(q)


def test_quantized_tree_is_jit_argument_and_runs_under_scan():
    rng = np.random.default_rng(5)
    params = {"weight": jnp.asarray(rng.standard_normal((64, 64)) * 0.1,
                                    jnp.float32)}
    q = quantize_params({"m": params}, "w8a8", min_size=1)

    @jax.jit
    def step(tree, x):
        def body(carry, _):
            return basic.linear(tree["m"], carry), None

        return jax.lax.scan(body, x, None, length=3)[0]

    out = step(q, jnp.ones((2, 64), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


# -- SDModel lifecycle -------------------------------------------------------


def _leaf_count(tree, key):
    n = 0
    if isinstance(tree, dict):
        n += int(key in tree)
        for v in tree.values():
            n += _leaf_count(v, key)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            n += _leaf_count(v, key)
    return n


def test_sdmodel_quantize_and_revert():
    m = make_tiny_model("sd15")
    fp_tree = m.unet_params
    m.quantize("w8a8", min_size=1)
    assert m.quant_mode == "w8a8"
    assert _leaf_count(m.unet_params, "weight_int8") > 0
    m.quantize(None)
    assert _leaf_count(m.unet_params, "weight_int8") == 0
    chex = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), m.unet_params, fp_tree)
    )
    assert chex, "revert must restore the pristine fp weights"


def _rand_adapter(key, params, rank=2, scale=0.1):
    from stablediffusion_tpu.lora.core import (
        UNET_TARGET_SUFFIXES,
        linear_module_paths,
    )

    paths = linear_module_paths(params, UNET_TARGET_SUFFIXES)
    keys = jax.random.split(key, 2 * len(paths))
    tree = {}
    for i, p in enumerate(paths):
        node = params
        for part in p.split("."):
            node = node[part]
        n_in, n_out = node["weight"].shape
        tree[p] = {
            "down": jax.random.normal(keys[2 * i], (n_in, rank)) * scale,
            "up": jax.random.normal(keys[2 * i + 1], (rank, n_out)) * scale,
            "alpha": jnp.asarray(float(rank)),
        }
    return tree


def test_sdmodel_quantize_survives_adapter_swap():
    m = make_tiny_model("sd15")
    m.quantize("w8", min_size=1)
    n_q = _leaf_count(m.unet_params, "weight_int8")
    assert n_q > 0
    # adapters resolve against the pristine fp base, not the quantized tree
    adapter = _rand_adapter(jax.random.key(0), m._base_params["unet"])
    m.load_lora_weights("a", {"unet": adapter})
    m.set_adapters({"a": 0.5})
    assert _leaf_count(m.unet_params, "weight_int8") == n_q, (
        "quantization must be re-applied after LoRA fusion")
    m.delete_adapters()
    assert _leaf_count(m.unet_params, "weight_int8") == n_q


def test_quantized_pipeline_end_to_end():
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    m = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    ref = pipe(m, prompt="a cat", height=32, width=32,
               num_inference_steps=2, seed=7).images
    m.quantize("w8a8", min_size=1)
    out = pipe(m, prompt="a cat", height=32, width=32,
               num_inference_steps=2, seed=7).images
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    # approximate, but the same image up to quantization error
    assert np.abs(out - ref).mean() < 0.15


def test_handler_quantize_key():
    from stablediffusion_tpu.serve.handler import Handler

    m = make_tiny_model("sd15")
    h = Handler(model=m)
    out = h(
        {
            "mode": "inference",
            "model": {"quantize": "w8a8"},
            "prompt": "a cat",
            "height": 32,
            "width": 32,
            "steps": 1,
            "seed": 1,
        }
    )
    assert "error" not in out, out.get("error")
    assert m.quant_mode == "w8a8"
    # declarative revert
    out = h(
        {
            "mode": "inference",
            "model": {"quantize": None},
            "prompt": "a cat",
            "height": 32,
            "width": 32,
            "steps": 1,
            "seed": 1,
        }
    )
    assert "error" not in out, out.get("error")
    assert m.quant_mode is None

    with pytest.raises(Exception):
        h.maybe_reload_model({"quantize": "int4"})


def test_sd3_quantize_lifecycle_and_pipeline():
    from test_sd3 import make_tiny_sd3_model
    from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    m = make_tiny_sd3_model()
    pipe = StableDiffusion3Pipeline()
    ref = pipe(m, prompt="a cat", height=32, width=32,
               num_inference_steps=2, seed=5).images
    m.quantize("w8a8", min_size=1)
    assert _leaf_count(m.transformer_params, "weight_int8") > 0
    # boundary layers stay fp
    tp = m.transformer_params
    assert "weight" in tp["proj_out"]
    assert "weight" in tp["context_embedder"]
    out = pipe(m, prompt="a cat", height=32, width=32,
               num_inference_steps=2, seed=5).images
    assert out.shape == ref.shape and np.isfinite(out).all()
    assert np.abs(out - ref).mean() < 0.15
    m.quantize(None)
    out2 = pipe(m, prompt="a cat", height=32, width=32,
                num_inference_steps=2, seed=5).images
    np.testing.assert_array_equal(out2, ref)


@pytest.mark.parametrize("mode,atol", [("w8", 2e-5), ("w8a8", 6e-3)])
def test_quantized_tree_tp_sharding_matches(mode, atol):
    """TP placement on a quantized tree (serving --mesh_tp + model.quantize):
    the int8 kernels and their scales shard like fp weights.

    Tolerances: "w8" dequantizes to the fp path, so it matches replicated
    execution at the same 2e-5 the fp TP test uses.  "w8a8" cannot be that
    tight under TP: the column-parallel QK contraction reduces in fp32 with
    a different accumulation order, and a 1-ulp drift near a round()
    boundary flips an int8 activation code (a ~1/127 relative jump) — so
    the bound is a few quantization steps, not float ulps."""
    import jax.numpy as jnp
    from stablediffusion_tpu.models import unet
    from stablediffusion_tpu.ops.quant import quantize_params
    from stablediffusion_tpu.parallel import make_mesh
    from stablediffusion_tpu.parallel.tp import shard_params_tp

    m = make_tiny_model("sd15")
    q = quantize_params(m.unet_params, mode, min_size=1)
    mesh = make_mesh(data=4, tensor=2)
    sharded = shard_params_tp(q, mesh)
    # at least one int8 kernel actually got a tensor-axis shard
    from jax.sharding import PartitionSpec as P

    specs = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "weight_int8":
                    specs.append(v.sharding.spec)
                else:
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(sharded)
    assert any(s != P() for s in specs), "no int8 kernel was TP-sharded"

    lat = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    ctx = jax.random.normal(
        jax.random.key(1), (2, 77, m.unet_config.cross_attention_dim))
    a = unet.apply(q, m.unet_config, lat, jnp.asarray(500), ctx)
    b = unet.apply(sharded, m.unet_config, lat, jnp.asarray(500), ctx)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol)


def test_quantize_params_a8_min_out_mixes_modes():
    """a8_min_out: wide-output layers get the int8-MXU (w8a8) structure,
    narrow ones fall back to weight-only (w8) — per-leaf, one tree."""
    rng = np.random.default_rng(9)

    def wdict(shape):
        return {"weight": jnp.asarray(rng.standard_normal(shape) * 0.1,
                                      jnp.float32)}

    params = {
        "wide": wdict((64, 256)),
        "narrow": wdict((64, 64)),
        "conv_wide": wdict((3, 3, 8, 256)),
        "conv_narrow": wdict((3, 3, 8, 64)),
    }
    q = quantize_params({"m": params}, "w8a8", min_size=1, a8_min_out=128)["m"]
    assert "w8a8_scale" in q["wide"] and "w8a8_scale" in q["conv_wide"]
    assert "w8_scale" in q["narrow"] and "w8_scale" in q["conv_narrow"]
    # the mixed tree runs through the autodetecting ops under jit
    y = jax.jit(lambda t, x: basic.linear(t["narrow"],
                                          basic.linear(t["wide"], x)[..., :64]))(
        q, jnp.ones((2, 64), jnp.float32))
    assert np.isfinite(np.asarray(y)).all()
    # w8 everywhere when mode is w8 regardless of a8_min_out
    q2 = quantize_params({"m": params}, "w8", min_size=1, a8_min_out=128)["m"]
    assert "w8_scale" in q2["wide"]


def test_resolve_quant_mode_auto_matches_measured_optima():
    """"auto" must resolve to the regime winners recorded in
    RESULTS.json["int8_mixed_sdxl"/"int8_mixed_sd15_b8"] (b1: full w8a8 is
    a 0.66x slowdown, mixed w8a8:2048 is 1.11x; b8: full w8a8 1.108x)."""
    from stablediffusion_tpu.ops.quant import (
        resolve_quant_mode,
        validate_quant_mode,
    )

    validate_quant_mode("auto")  # accepted at the edges
    assert resolve_quant_mode("auto", 1) == "w8a8:2048"
    assert resolve_quant_mode("auto", 4) == "w8a8:2048"
    assert resolve_quant_mode("auto", 8) == "w8a8"
    assert resolve_quant_mode("auto", 32) == "w8a8"
    # pass-through for every concrete spelling and None
    for m in (None, "w8", "w8a8", "w8a8:2048"):
        assert resolve_quant_mode(m, 8) == m


def test_model_quantize_auto_stores_concrete_mode():
    m = make_tiny_model("sd15")
    m.quantize("auto")  # latency default
    assert m.quant_mode == "w8a8:2048"
    m.quantize("auto", expected_batch=8)
    assert m.quant_mode == "w8a8"
    m.quantize(None)
    assert m.quant_mode is None


def test_handler_quantize_auto_resolves_and_is_idempotent():
    """A client sending quantize:"auto" every request must quantize ONCE at
    the serving regime's optimum — the handler resolves before the
    idempotence comparison."""
    from stablediffusion_tpu.serve.handler import Handler

    m = make_tiny_model("sd15")
    h = Handler(model=m)
    h.expected_batch = 8  # what serve_http sets from --max_batch
    h.maybe_reload_model({"quantize": "auto"})
    assert m.quant_mode == "w8a8"
    # repeat request: mode already concrete-equal, no re-quantize churn
    base_tree = m.unet_params
    h.maybe_reload_model({"quantize": "auto"})
    assert m.unet_params is base_tree
    # latency server resolves to the mixed mode instead
    h2 = Handler(model=make_tiny_model("sd15"))
    h2.maybe_reload_model({"quantize": "auto"})
    assert h2.model.quant_mode == "w8a8:2048"

"""LoRA: fuse math, adapter management, format roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.lora import (
    UNET_TARGET_SUFFIXES,
    apply_lora_for_training,
    fuse,
    init_lora,
    linear_module_paths,
    load_lora_file,
    parse_lora_state_dict,
    save_lora_file,
)
from stablediffusion_tpu.models import unet
from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

from helpers import make_tiny_model


@pytest.fixture(scope="module")
def model():
    return make_tiny_model("sd15")


def _rand_adapter(key, params, rank=4, scale=0.1):
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


def test_target_discovery(model):
    paths = linear_module_paths(model.unet_params, UNET_TARGET_SUFFIXES)
    assert paths, "no targets found"
    assert all(
        p.endswith(("to_q", "to_k", "to_v", "to_out.0")) for p in paths
    )
    # tiny unet transformer2d count: down cross-attn block has 1 (layers=1),
    # up cross-attn block has 2 (layers+1), mid has 1 -> 4 blocks, each with
    # attn1+attn2 x 4 projections
    assert len(paths) == 4 * 2 * 4


def test_delta_w_math(model):
    params = model.unet_params
    adapter = _rand_adapter(jax.random.key(0), params)
    fused = fuse(params, {"a": adapter}, {"a": 0.7})
    path = next(iter(adapter))
    node_f, node_b = fused, params
    for part in path.split("."):
        node_f, node_b = node_f[part], node_b[part]
    expected = node_b["weight"] + 0.7 * (
        adapter[path]["alpha"] / adapter[path]["down"].shape[1]
    ) * (adapter[path]["down"] @ adapter[path]["up"])
    np.testing.assert_allclose(
        np.asarray(node_f["weight"]), np.asarray(expected), atol=1e-6
    )
    # untouched modules are shared, not copied
    assert fused["conv_in"]["weight"] is params["conv_in"]["weight"]


def test_multi_adapter_additivity(model):
    params = model.unet_params
    a = _rand_adapter(jax.random.key(1), params)
    b = _rand_adapter(jax.random.key(2), params)
    both = fuse(params, {"a": a, "b": b}, {"a": 0.5, "b": 0.25})
    only_a = fuse(params, {"a": a}, {"a": 0.5})
    seq = fuse(only_a, {"b": b}, {"b": 0.25})
    path = next(iter(a))
    for tree in (both, seq):
        pass
    get = lambda t: np.asarray(
        t["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"][
            "attn1"
        ]["to_q"]["weight"]
    )
    np.testing.assert_allclose(get(both), get(seq), atol=1e-5)


def test_zero_scale_is_identity(model):
    params = model.unet_params
    a = _rand_adapter(jax.random.key(3), params)
    fused = fuse(params, {"a": a}, {"a": 0.0})
    chex_leaves = jax.tree_util.tree_leaves(fused)
    base_leaves = jax.tree_util.tree_leaves(params)
    for x, y in zip(chex_leaves, base_leaves):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_training_init_is_identity(model):
    lora = init_lora(jax.random.key(4), model.unet_params, rank=4,
                     suffixes=UNET_TARGET_SUFFIXES)
    eff = apply_lora_for_training(model.unet_params, lora)
    # up is zero-init -> no change
    for x, y in zip(
        jax.tree_util.tree_leaves(eff), jax.tree_util.tree_leaves(model.unet_params)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_format_roundtrip(tmp_path, model):
    adapter = {"unet": _rand_adapter(jax.random.key(5), model.unet_params)}
    p = tmp_path / "sd15_test.safetensors"
    save_lora_file(adapter, p)
    back = load_lora_file(str(p))
    assert set(back) == {"unet"}
    assert set(back["unet"]) == set(adapter["unet"])
    for path, f in adapter["unet"].items():
        np.testing.assert_allclose(
            np.asarray(back["unet"][path]["down"]), np.asarray(f["down"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(back["unet"][path]["up"]), np.asarray(f["up"]), atol=1e-6
        )


def test_kohya_format_parsing(model):
    paths = linear_module_paths(model.unet_params, UNET_TARGET_SUFFIXES)
    path = paths[0]
    rank, n_in = 4, 16
    flat = {
        f"lora_unet_{path.replace('.', '_')}.lora_down.weight": np.ones(
            (rank, n_in), np.float32
        ),
        f"lora_unet_{path.replace('.', '_')}.lora_up.weight": np.zeros(
            (n_in, rank), np.float32
        ),
        f"lora_unet_{path.replace('.', '_')}.alpha": np.asarray(2.0, np.float32),
    }
    parsed = parse_lora_state_dict(flat, model_paths={"unet": paths})
    assert path in parsed["unet"]
    assert parsed["unet"][path]["down"].shape == (n_in, rank)
    assert float(parsed["unet"][path]["alpha"]) == 2.0


def test_non_lora_keys_rejected():
    with pytest.raises(ValueError):
        parse_lora_state_dict({"unet.conv_in.weight": np.zeros((3, 3))})


def test_wrapper_adapter_lifecycle_changes_output(tmp_path, model):
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(prompt="cat", height=32, width=32, num_inference_steps=2, seed=6)
    base = pipe(model, **kw)

    adapter = {"unet": _rand_adapter(jax.random.key(7), model.unet_params, scale=0.5)}
    p = tmp_path / "sd15_style.safetensors"
    save_lora_file(adapter, p)

    model.load_loras("style", lora_dir=str(tmp_path))
    assert model.get_list_adapters() == {"style": 1.0}
    with_lora = pipe(model, **kw)
    assert np.abs(base.images - with_lora.images).max() > 1e-5

    # reweight
    model.set_adapters({"style": 0.2})
    reweighted = pipe(model, **kw)
    assert np.abs(with_lora.images - reweighted.images).max() > 1e-6

    # delete restores baseline exactly
    model.delete_adapters()
    restored = pipe(model, **kw)
    np.testing.assert_array_equal(base.images, restored.images)


def test_inference_text_encoder_lora_scale(tmp_path, model):
    """cross_attention_kwargs={'scale'} scales text-encoder adapters per
    request (the reference's scale_lora_layers hook)."""
    import jax

    from stablediffusion_tpu.lora import TEXT_TARGET_SUFFIXES

    paths = linear_module_paths(model.text_encoder_params, TEXT_TARGET_SUFFIXES)
    keys = jax.random.split(jax.random.key(11), 2 * len(paths))
    tree = {}
    for i, p in enumerate(paths):
        node = model.text_encoder_params
        for part in p.split("."):
            node = node[part]
        n_in, n_out = node["weight"].shape
        tree[p] = {
            "down": jax.random.normal(keys[2 * i], (n_in, 4)) * 0.2,
            "up": jax.random.normal(keys[2 * i + 1], (4, n_out)) * 0.2,
        }
    model.load_lora_weights("te_style", {"text_encoder": tree})
    model.set_adapters({"te_style": 1.0})
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(prompt="cat", height=32, width=32, num_inference_steps=2, seed=2)
    try:
        full = pipe(model, **kw)
        half = pipe(model, **kw, cross_attention_kwargs={"scale": 0.5})
        zero = pipe(model, **kw, cross_attention_kwargs={"scale": 0.0})
        base = pipe(model, **kw)  # no kwargs -> adapter at full weight again
        assert np.abs(full.images - half.images).max() > 1e-6
        np.testing.assert_array_equal(full.images, base.images)
        # scale 0 == adapter removed from the text encoder
        model.delete_adapters()
        clean = pipe(model, **kw)
        np.testing.assert_allclose(zero.images, clean.images, atol=1e-5)
    finally:
        model.delete_adapters()


def test_kohya_file_through_load_loras_applies(tmp_path, model):
    """Production path: SDModel.load_loras resolves kohya underscore keys
    against the model's own module paths (no explicit model_paths), so a
    kohya-format LoRA must actually change the fused weights (ADVICE r1)."""
    from stablediffusion_tpu.io.safetensors_io import save_safetensors

    paths = linear_module_paths(model.unet_params, UNET_TARGET_SUFFIXES)
    flat = {}
    rank = 4
    for path in paths[:3]:
        node = model.unet_params
        for part in path.split("."):
            node = node[part]
        n_in, n_out = node["weight"].shape
        k = f"lora_unet_{path.replace('.', '_')}"
        flat[f"{k}.lora_down.weight"] = np.full((rank, n_in), 0.05, np.float32)
        flat[f"{k}.lora_up.weight"] = np.full((n_out, rank), 0.05, np.float32)
        flat[f"{k}.alpha"] = np.asarray(float(rank), np.float32)
    save_safetensors(flat, str(tmp_path / "sd15_kstyle.safetensors"))

    try:
        model.load_loras("kstyle", lora_dir=str(tmp_path))
        node = model.unet_params
        base = model._base_params["unet"]
        for part in paths[0].split("."):
            node, base = node[part], base[part]
        diff = np.abs(np.asarray(node["weight"]) - np.asarray(base["weight"]))
        assert diff.max() > 1e-4, "kohya LoRA fused as a silent no-op"
    finally:
        model.delete_adapters()


def test_fuse_raises_on_fully_unmatched_adapter(model):
    bogus = {"nonexistent.module.path": {
        "down": jnp.ones((8, 4)), "up": jnp.ones((4, 8)),
    }}
    with pytest.raises(ValueError, match="matched no module"):
        fuse(model.unet_params, {"bad": bogus})


def test_save_kohya_format_roundtrip():
    """format='kohya' writes lora_unet_*/lora_te_* down/up/alpha keys that
    parse back to the same factors (webui interchange)."""
    import numpy as np

    from stablediffusion_tpu.io.safetensors_io import load_safetensors
    from stablediffusion_tpu.lora.formats import (
        load_lora_file,
        save_lora_file,
    )

    rng = np.random.default_rng(0)
    adapters = {
        "unet": {
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q": {
                "down": jnp.asarray(rng.standard_normal((16, 4)), jnp.float32),
                "up": jnp.asarray(rng.standard_normal((4, 16)), jnp.float32),
            }
        },
        "text_encoder": {
            "text_model.encoder.layers.0.self_attn.q_proj": {
                "down": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32),
                "up": jnp.asarray(rng.standard_normal((4, 8)), jnp.float32),
                "alpha": jnp.asarray(2.0),
            }
        },
    }
    import tempfile, os

    f = os.path.join(tempfile.mkdtemp(), "kohya.safetensors")
    save_lora_file(adapters, f, format="kohya")
    flat = load_safetensors(f)
    assert any(k.startswith("lora_unet_") for k in flat)
    assert any(k.startswith("lora_te_") for k in flat)  # no te2 -> bare te
    assert all(".lora_down.weight" in k or ".lora_up.weight" in k
               or k.endswith(".alpha") for k in flat)
    # round-trip through the kohya parser (exact resolver via model_paths)
    model_paths = {c: list(tree) for c, tree in adapters.items()}
    back = load_lora_file(f, model_paths)
    for c, tree in adapters.items():
        for p, fac in tree.items():
            np.testing.assert_allclose(np.asarray(back[c][p]["down"]),
                                       np.asarray(fac["down"]), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(back[c][p]["up"]),
                                       np.asarray(fac["up"]), rtol=1e-6)
    # explicit alpha survives; default alpha == rank
    assert float(back["text_encoder"][
        "text_model.encoder.layers.0.self_attn.q_proj"]["alpha"]) == 2.0
    assert float(back["unet"][
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    ]["alpha"]) == 4.0

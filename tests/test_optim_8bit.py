"""Blockwise 8-bit Adam (optim.scale_by_adam_8bit) — the reference's
`--use_8bit_adam` (bitsandbytes AdamW8bit, train_text_to_image_lora.py:283-315)
implemented natively.

Covers: quantizer roundtrip error bounds, fp32 passthrough for small leaves,
first-step equivalence with optax.scale_by_adam, end-to-end convergence
parity on a least-squares problem, grad-accumulation wrapping, and orbax
checkpoint roundtrip of the quantized state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stablediffusion_tpu.train import optim
from stablediffusion_tpu.train.optim import (
    BLOCK_SIZE,
    MIN_QUANT_SIZE,
    QuantizedMoment,
    _dequantize,
    _quantize_m,
    _quantize_v,
    scale_by_adam_8bit,
)


def test_quantize_m_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (5000,), jnp.float32)
    out = _dequantize(_quantize_m(x), x)
    # sqrt companding: |err| <= sqrt(|x| * absmax)/127 + absmax/127^2 floor
    blocks = np.asarray(jnp.pad(x, (0, (-x.size) % BLOCK_SIZE)).reshape(-1, BLOCK_SIZE))
    absmax = np.abs(blocks).max(axis=1, keepdims=True)
    amax = np.repeat(absmax, BLOCK_SIZE, axis=1).reshape(-1)[: x.size]
    err = np.abs(np.asarray(out) - np.asarray(x))
    bound = np.sqrt(np.abs(np.asarray(x)) * amax) / 127.0 + amax / 127**2
    assert (err <= bound + 1e-12).all()


def test_quantize_v_roundtrip_relative_error():
    # second moments span decades; sqrt map must keep small values resolvable
    x = jnp.concatenate(
        [jnp.full((256,), 1e-8), jnp.full((256,), 1e-4), jnp.full((256,), 1.0)]
    )
    out = np.asarray(_dequantize(_quantize_v(x), x))
    ref = np.asarray(x)
    # each block is constant => its absmax equals the value, roundtrip ~exact
    np.testing.assert_allclose(out, ref, rtol=1e-2)
    # mixed-magnitude block: 1e-4 next to 1.0 still reconstructs within 2x
    mix = jnp.concatenate([jnp.full((128,), 1e-4), jnp.full((128,), 1.0)])
    got = np.asarray(_dequantize(_quantize_v(mix), mix))
    assert abs(got[0] - 1e-4) < 1e-4 and abs(got[-1] - 1.0) < 1e-2


def test_small_leaves_stay_fp32_big_leaves_quantize():
    params = {
        "small": jnp.zeros((16, 16)),  # 256 < MIN_QUANT_SIZE
        "big": jnp.zeros((64, 128)),  # 8192 >= MIN_QUANT_SIZE
    }
    assert params["big"].size >= MIN_QUANT_SIZE
    st = scale_by_adam_8bit().init(params)
    assert isinstance(st.mu["big"], QuantizedMoment)
    assert st.mu["big"].q.dtype == jnp.int8
    assert st.nu["big"].q.dtype == jnp.uint8
    assert not isinstance(st.mu["small"], QuantizedMoment)
    assert st.mu["small"].dtype == jnp.float32


def test_first_step_matches_fp32_adam():
    key = jax.random.PRNGKey(3)
    params = {"w": jax.random.normal(key, (64, 128))}
    g = {"w": jax.random.normal(jax.random.PRNGKey(4), (64, 128))}
    tx8 = scale_by_adam_8bit()
    txf = optax.scale_by_adam()
    u8, _ = tx8.update(g, tx8.init(params), params)
    uf, _ = txf.update(g, txf.init(params), params)
    np.testing.assert_allclose(
        np.asarray(u8["w"]), np.asarray(uf["w"]), rtol=0.05, atol=1e-3
    )


def _lsq_problem():
    params = {
        "W": jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1,
        "b": jnp.zeros((64,)),
    }
    X = jax.random.normal(jax.random.PRNGKey(1), (256, 128))
    Y = X @ jax.random.normal(jax.random.PRNGKey(2), (64, 128)).T

    def loss_fn(p):
        return jnp.mean((X @ p["W"].T + p["b"] - Y) ** 2)

    return params, loss_fn


def _train(tx, params, loss_fn, steps):
    st = tx.init(params)

    @jax.jit
    def step(p, st):
        g = jax.grad(loss_fn)(p)
        u, st = tx.update(g, st, p)
        return optax.apply_updates(p, u), st

    p = params
    for _ in range(steps):
        p, st = step(p, st)
    return float(loss_fn(p)), st


def test_convergence_parity_with_fp32_adamw():
    params, loss_fn = _lsq_problem()
    sched = optax.constant_schedule(1e-2)
    l0 = float(loss_fn(params))
    lf, _ = _train(optim.make_optimizer(sched, use_8bit=False), params, loss_fn, 300)
    l8, _ = _train(optim.make_optimizer(sched, use_8bit=True), params, loss_fn, 300)
    assert lf < 0.02 * l0
    # within 2x of fp32 final loss (measured ~0.55 vs 0.48)
    assert l8 < 2.0 * lf


def test_grad_accumulation_wrapping():
    params, loss_fn = _lsq_problem()
    tx = optim.make_optimizer(
        optax.constant_schedule(1e-2), grad_accum_steps=2, use_8bit=True
    )
    lf, _ = _train(tx, params, loss_fn, 100)
    assert lf < float(loss_fn(params))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("data8")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.uniform(size=(48, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg")
        (d / f"img{i}.txt").write_text(f"a cat number {i}")
    return str(d)


def test_trainer_wiring_8bit(tmp_path, data_dir):
    """SDLoRATrainer runs end-to-end with use_8bit_adam=True (tiny-model LoRA
    leaves are < MIN_QUANT_SIZE, so this proves the flag plumbing and the
    fp32-passthrough path inside the jitted train step)."""
    from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

    from helpers import make_tiny_model

    model = make_tiny_model("sd15")
    args = SDTrainingArgs(
        train_batch_size=2,
        rank=2,
        resolution=32,
        max_train_steps=2,
        learning_rate=1e-3,
        lr_scheduler="constant",
        lr_warmup_steps=0,
        mixed_precision="no",
        use_8bit_adam=True,
        output_dir=str(tmp_path / "out8"),
        log_every=1,
        seed=0,
    )
    lora = SDLoRATrainer(model, args, data_dir).train()
    up_norm = sum(float(jnp.abs(f["up"]).sum()) for f in lora["unet"].values())
    assert up_norm > 0.0


def test_checkpoint_roundtrip_quantized_state(tmp_path):
    from stablediffusion_tpu.train import checkpoint as ckpt

    params, loss_fn = _lsq_problem()
    tx = optim.make_optimizer(optax.constant_schedule(1e-2), use_8bit=True)
    _, st = _train(tx, params, loss_fn, 3)
    path = ckpt.save_checkpoint(str(tmp_path), 3, {"opt_state": st})
    template = {"opt_state": tx.init(params)}
    restored = ckpt.load_checkpoint(path, template)["opt_state"]
    for a, b in zip(
        jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(restored)
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""ZeRO state sharding (parallel/zero.py): the largest-divisible-axis leaf
rule, numerical equivalence of ZeRO-1 / FSDP steps with the replicated mesh
step on the 8-device CPU mesh, split steady-state layouts, and buffer
donation semantics."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.parallel import make_mesh
from stablediffusion_tpu.parallel import zero
from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
from stablediffusion_tpu.train.train_step import make_train_step

from test_train import _tiny_step_setup


def test_leaf_rule():
    mesh = make_mesh()  # 8 CPU devices on the data axis
    tree = {
        "conv": jnp.zeros((3, 3, 16, 32)),  # HWIO -> split O (largest /8)
        "linear": jnp.zeros((48, 24)),      # split in (largest /8)
        "bias": jnp.zeros((7,)),            # nothing divides -> replicated
        "scale": jnp.zeros(()),             # scalar -> replicated
        "embed": jnp.zeros((49408, 8)),     # split vocab
    }
    s = zero.tree_shardings(tree, mesh)
    assert s["conv"].spec == jax.sharding.PartitionSpec(None, None, None, "data")
    assert s["linear"].spec == jax.sharding.PartitionSpec("data", None)
    assert s["bias"].spec == jax.sharding.PartitionSpec()
    assert s["scale"].spec == jax.sharding.PartitionSpec()
    assert s["embed"].spec == jax.sharding.PartitionSpec("data", None)


def _batch8(model):
    rng = np.random.default_rng(7)
    B = 8
    return {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 32, 32, 3)) * 0.5, jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 99, (B, 77)), jnp.int32),
    }


@pytest.mark.parametrize(
    "shard_opt,shard_params", [(True, False), (True, True)]
)
def test_zero_step_matches_replicated(shard_opt, shard_params):
    """ZeRO-1 / FSDP only change the layout + collectives; loss and the
    updated factors must match the replicated mesh step."""
    model, statics, frozen, lora, _, sched = _tiny_step_setup("sd15")
    batch = _batch8(model)
    mesh = make_mesh()
    opt = make_optimizer(make_lr_schedule("constant", 1e-3))
    key = jax.random.key(5)

    base_step = make_train_step(statics, sched, opt, mesh=mesh)
    ref_lora, ref_opt, ref_m = base_step(lora, opt.init(lora), frozen, batch, key)

    z_step = make_train_step(
        statics, sched, opt, mesh=mesh,
        shard_opt_state=shard_opt, shard_params=shard_params,
    )
    opt_state = zero.shard_tree(opt.init(lora), mesh)
    z_lora, z_frozen = lora, frozen
    if shard_params:
        z_lora = zero.shard_tree(lora, mesh)
        z_frozen = zero.shard_tree(frozen, mesh)
    out_lora, out_opt, out_m = z_step(z_lora, opt_state, z_frozen, batch, key)

    np.testing.assert_allclose(
        np.asarray(ref_m["loss"]), np.asarray(out_m["loss"]), rtol=2e-5
    )
    a = jax.tree_util.tree_leaves(ref_lora)
    b = jax.tree_util.tree_leaves(out_lora)
    for x, y in zip(a, b):
        # reduce-scattered grads change the reduction order inside Adam's
        # moment update — bit-identity is not expected, closeness is
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=5e-4, atol=2e-6
        )

    # the optimizer moments actually live split over the data axis
    sharded_leaves = [
        l for l in jax.tree_util.tree_leaves(out_opt)
        if hasattr(l, "sharding") and "data" in str(l.sharding.spec)
    ]
    assert sharded_leaves, "no opt-state leaf is split over the data axis"
    if shard_params:
        specs = {
            str(l.sharding.spec)
            for l in jax.tree_util.tree_leaves(out_lora)
            if hasattr(l, "sharding")
        }
        assert any("data" in s for s in specs)


def test_donated_step_rebinding():
    """donate=True invalidates the input state buffers; the trainer-loop
    rebinding pattern keeps working across steps."""
    model, statics, frozen, lora, batch, sched = _tiny_step_setup("sd15")
    opt = make_optimizer(make_lr_schedule("constant", 1e-3))
    step = make_train_step(statics, sched, opt, donate=True)
    opt_state = opt.init(lora)
    l1, o1, m1 = step(lora, opt_state, frozen, batch, jax.random.key(0))
    l2, o2, m2 = step(l1, o1, frozen, batch, jax.random.key(1))
    assert np.isfinite(float(m2["loss"]))
    first = jax.tree_util.tree_leaves(l1)[0]
    assert first.is_deleted()  # buffer was donated into step 2


def test_trainer_rejects_shard_flags_without_mesh(tmp_path):
    from stablediffusion_tpu.models.wrapper import SDModel  # noqa: F401
    from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs
    from helpers import make_tiny_model

    model = make_tiny_model("sd15")
    args = SDTrainingArgs(
        train_batch_size=2, rank=2, resolution=32, max_train_steps=1,
        mixed_precision="no", output_dir=str(tmp_path), shard_opt_state=True,
    )
    with pytest.raises(ValueError, match="mesh"):
        SDLoRATrainer(model, args, str(tmp_path)).train()

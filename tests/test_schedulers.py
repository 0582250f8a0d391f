"""Scheduler tests.

The strongest check is the point-mass oracle: if the model returns the exact
posterior noise for a point-mass data distribution at x0, every sampler must
converge to x0 at its terminal step — first- and second-order update algebra,
sigma tables and timestep bookkeeping all have to be right for that to happen
(multistep corrections vanish only if their coefficients are correct).
Schedulers whose terminal alpha is ac[0] (DDIM/PNDM) land within ~3% of x0 by
construction; zero-terminal-sigma schedulers land to fp precision.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.core.config import SchedulerConfig
from stablediffusion_tpu.schedulers import (
    SCHEDULER_NAMES,
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralScheduler,
    EulerDiscreteScheduler,
    PNDMScheduler,
    UniPCScheduler,
    make_scheduler,
)
from stablediffusion_tpu.schedulers.common import karras_sigma_grid

SHAPE = (1, 4, 8, 8)


def _oracle_model(sched, plan, x0):
    """Exact point-mass noise prediction in each family's parametrization."""

    def model(x, i):
        x = x.astype(jnp.float32)
        if isinstance(sched, (DDIMScheduler, PNDMScheduler, DDPMScheduler)):
            t = plan.timesteps[i]
            ac = plan.alphas_cumprod[t]
            return (x - jnp.sqrt(ac) * x0) / jnp.sqrt(1.0 - ac)
        if isinstance(sched, (EulerDiscreteScheduler, EulerAncestralScheduler)):
            sigma = plan.sigmas[i]
            return (x - x0) / sigma
        # DPM / UniPC
        sigma = plan.sigmas[i]
        alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        sigma_t = sigma * alpha_t
        return (x - alpha_t * x0) / sigma_t

    return model


def _run(sched, plan, x0, seed=0):
    """Full denoise as one jitted lax.scan (the pipeline's compilation model)."""
    model = _oracle_model(sched, plan, x0)
    init = (
        jax.random.normal(jax.random.key(seed), SHAPE, jnp.float32)
        * plan.init_noise_sigma
    )
    state0 = sched.init_state(plan, SHAPE)
    keys = jax.random.split(jax.random.key(seed + 1), plan.num_steps)

    @jax.jit
    def run(init, state0):
        def body(carry, inp):
            x, state = carry
            i, key = inp
            _ = sched.scale_model_input(plan, x, i)
            out = model(x, i)
            x_new, state = sched.step(plan, state, i, out, x, key=key)
            return (x_new, state), ()

        (x, _), _ = jax.lax.scan(
            body, (init, state0), (jnp.arange(plan.num_steps), keys)
        )
        return x

    return np.asarray(run(init, state0))


ORACLE_CASES = [
    # DDIM/PNDM terminal alpha is ac[0]: residual ~ sqrt(1-ac[0]) * max|eps|
    # ~ 0.03 * 3.5 over 256 gaussian elements -> tol 0.15
    ("DDIM", 20, 0.15),
    ("euler", 20, 1e-3),
    ("euler_a", 20, 1e-3),
    ("DPM++ 2M", 20, 1e-3),
    ("DPM++ 2M Karras", 20, 1e-3),
    ("DPM++ 2M SDE Karras", 20, 2e-2),
    ("PNDM", 20, 0.15),
    ("uni_pc", 20, 1e-3),
    ("DDPM", 50, 0.2),
    # k-diffusion converter samplers; the Euler-family oracle covers both
    # (heun's corrector eval at odd interleaved indices reads sigmas[i] =
    # sigma_next, exactly what the oracle expects)
    ("heun", 20, 1e-3),
    ("lms", 20, 1e-3),
]


@pytest.mark.parametrize("name,steps,tol", ORACLE_CASES)
def test_point_mass_oracle(name, steps, tol):
    sched = make_scheduler(name)
    plan = sched.plan(steps)
    x0 = jnp.asarray(
        np.random.default_rng(3).normal(size=SHAPE) * 0.5, jnp.float32
    )
    final = _run(sched, plan, x0)
    err = np.abs(final - np.asarray(x0)).max()
    assert err < tol, f"{name}: max err {err}"
    assert np.isfinite(final).all()


@pytest.mark.parametrize("name", ["DDIM", "euler", "DPM++ 2M", "uni_pc"])
def test_v_prediction_oracle(name):
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sched = make_scheduler(name, cfg)
    plan = sched.plan(20)
    x0 = jnp.asarray(np.random.default_rng(4).normal(size=SHAPE) * 0.5, jnp.float32)

    base = _oracle_model(sched, plan, x0)

    def to_v(x, i):
        eps = base(x, i)
        if isinstance(sched, (DDIMScheduler, PNDMScheduler)):
            ac = plan.alphas_cumprod[plan.timesteps[i]]
        else:
            sigma = plan.sigmas[i]
            ac = 1.0 / (sigma**2 + 1.0)
        # eps from the oracle is in the family's own parametrization; for
        # sigma-families reconstruct the VP sample first
        if isinstance(sched, (EulerDiscreteScheduler, EulerAncestralScheduler)):
            return jnp.sqrt(ac) * eps - jnp.sqrt(1 - ac) * x0
        return jnp.sqrt(ac) * eps - jnp.sqrt(1 - ac) * x0

    init = jax.random.normal(jax.random.key(0), SHAPE) * plan.init_noise_sigma
    state = sched.init_state(plan, SHAPE)
    x = init
    for i in range(plan.num_steps):
        out = to_v(x, i)
        x, state = sched.step(
            plan, state, jnp.asarray(i), out, x, key=jax.random.key(i)
        )
    err = np.abs(np.asarray(x) - np.asarray(x0)).max()
    assert err < 0.15, f"{name} v-pred: max err {err}"


def test_ddim_grid_sd15():
    # SD1.5 leading spacing, offset 1: 20 steps -> 951, 901, ..., 1
    plan = DDIMScheduler().plan(20)
    ts = np.asarray(plan.timesteps)
    assert ts[0] == 951 and ts[-1] == 1
    np.testing.assert_array_equal(np.diff(ts), -50)


def test_dpm_grid_plus_one_convention():
    plan = DPMSolverMultistepScheduler().plan(20)
    ts = np.asarray(plan.timesteps)
    assert len(ts) == 20
    # leading with N+1 anchors: ratio = 1000 // 21 = 47; the 0 anchor is
    # dropped (terminal handled by the appended zero sigma), offset +1
    assert ts[-1] == 48 and ts[0] == 47 * 20 + 1
    s = np.asarray(plan.sigmas)
    assert s[-1] == 0.0 and (np.diff(s[:-1]) < 0).all()


def test_pndm_duplicated_warmup_step():
    plan = PNDMScheduler().plan(10)
    ts = np.asarray(plan.timesteps)
    assert len(ts) == 11  # N+1 evaluations
    assert ts[1] == ts[2]  # duplicated second base timestep (after reverse)


def test_karras_grid():
    g = karras_sigma_grid(0.03, 14.6, 20)
    assert abs(g[0] - 14.6) < 1e-6 and abs(g[-1] - 0.03) < 1e-6
    assert (np.diff(g) < 0).all()


def test_euler_init_noise_sigma_and_scale():
    sched = EulerDiscreteScheduler()
    plan = sched.plan(20)
    s = np.asarray(plan.sigmas)
    # leading spacing: init_noise_sigma = sqrt(max^2+1)
    assert abs(float(plan.init_noise_sigma) - (s.max() ** 2 + 1) ** 0.5) < 1e-5
    x = jnp.ones((1, 4, 4, 4))
    scaled = sched.scale_model_input(plan, x, 0)
    np.testing.assert_allclose(
        np.asarray(scaled), 1.0 / (s[0] ** 2 + 1) ** 0.5, rtol=1e-5
    )


def test_add_noise_snr():
    sched = DDIMScheduler()
    x0 = jnp.ones((2, 4, 8, 8))
    noise = jax.random.normal(jax.random.key(0), x0.shape)
    t = jnp.asarray([10, 900])
    noisy = sched.add_noise(x0, noise, t)
    ac = np.asarray(sched.alphas_cumprod)
    expected0 = np.sqrt(ac[10]) * 1.0 + np.sqrt(1 - ac[10]) * np.asarray(noise[0])
    np.testing.assert_allclose(np.asarray(noisy[0]), expected0, rtol=1e-5)


def test_get_velocity_roundtrip():
    sched = DDPMScheduler()
    x0 = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.key(2), x0.shape)
    t = jnp.asarray([500, 100])
    v = sched.get_velocity(x0, noise, t)
    noisy = sched.add_noise(x0, noise, t)
    # identity: alpha*noisy - ... reconstructs x0 = sqrt(ac)*noisy - sqrt(1-ac)*v
    ac = sched.alphas_cumprod[t][:, None, None, None]
    rec = jnp.sqrt(ac) * noisy - jnp.sqrt(1 - ac) * v
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-5)


def test_registry_names():
    for name in SCHEDULER_NAMES:
        s = make_scheduler(name)
        assert s.plan(8).num_steps >= 8
    with pytest.raises(ValueError):
        make_scheduler("nope")


def test_determinism_under_jit():
    sched = make_scheduler("DPM++ 2M")
    plan = sched.plan(10)
    x0 = jnp.zeros(SHAPE)
    a = _run(sched, plan, x0, seed=5)
    b = _run(sched, plan, x0, seed=5)
    np.testing.assert_array_equal(a, b)


def test_lcm_scheduler():
    """LCM: origin-grid subsampling, consistency boundary conditions,
    re-noising except at the final step."""
    from stablediffusion_tpu.schedulers import LCMScheduler

    sched = make_scheduler("LCM")
    assert isinstance(sched, LCMScheduler)
    plan = sched.plan(4)
    ts = np.asarray(plan.timesteps)
    assert len(ts) == 4 and ts[0] == 999 and (np.diff(ts) < 0).all()
    # all timesteps lie on the 50-step origin grid (20k - 1)
    assert ((ts + 1) % 20 == 0).all()

    # runs through the pipeline
    import sys

    sys.path.insert(0, "tests")
    from helpers import make_tiny_model
    from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

    model = make_tiny_model("sd15", scheduler_name="LCM")
    pipe = StableDiffusionUnifiedPipeline()
    out = pipe(model, prompt="a cat", height=32, width=32,
               num_inference_steps=4, seed=8, guidance_scale=1.0)
    assert np.isfinite(out.images).all()

    with pytest.raises(ValueError):
        sched.plan(51)


def test_lcm_boundary_scalings():
    """scaled_timestep = t * 10 (LCM-LoRA distillation convention): at the
    final small-t step c_skip ~ 0 / c_out ~ 1, so the output is (almost)
    purely the x0 prediction; at t=0 exactly c_skip=1, c_out=0."""
    import jax

    sched = make_scheduler("LCM")
    plan = sched.plan(4)
    t_last = int(np.asarray(plan.timesteps)[-1])  # t=19 on the origin grid
    st = t_last * 10.0
    c_skip = 0.5**2 / (st**2 + 0.5**2)
    c_out = st / np.sqrt(st**2 + 0.5**2)
    assert c_skip < 1e-5 and c_out > 0.99999

    # step() at the last index must return c_out*x0 + c_skip*sample with
    # NO re-noising
    sample = jnp.full(SHAPE, 2.0)
    eps = jnp.full(SHAPE, 0.5)
    ac = float(np.asarray(plan.alphas_cumprod)[t_last])
    x0 = (2.0 - np.sqrt(1 - ac) * 0.5) / np.sqrt(ac)
    prev, _ = sched.step(plan, (), plan.num_steps - 1, eps, sample,
                         key=jax.random.key(0))
    expected = c_out * x0 + c_skip * 2.0
    np.testing.assert_allclose(np.asarray(prev), expected, rtol=1e-4)


def test_custom_timesteps_and_sigmas():
    """P4: every family accepts a custom descending timestep list; the
    sigma-space families accept a custom sigma list (which sets the step
    count); the alpha-space families reject sigmas (diffusers raises the
    same way)."""
    from stablediffusion_tpu.schedulers import SCHEDULER_NAMES

    ts_list = [801, 601, 401, 201, 1]
    for name in SCHEDULER_NAMES:
        sched = make_scheduler(name)
        if name == "LCM":
            continue  # LCM constrains timesteps to the origin grid
        if sched.config.use_karras_sigmas:
            # diffusers rejects custom timesteps under Karras re-gridding
            with pytest.raises(ValueError, match="use_karras_sigmas"):
                sched.plan(50, timesteps=ts_list)
            continue
        plan = sched.plan(50, timesteps=ts_list)
        got = np.asarray(plan.timesteps)
        # order-2 plans (heun) interleave: 2N-1 scan entries for N steps
        assert plan.num_steps == 5 * plan.order - (plan.order - 1), name
        if plan.order == 2:
            got = np.concatenate([got[:1], got[1::2]])
        if name == "FlowMatchEuler":
            # diffusers FlowMatchEulerDiscrete maps custom timesteps through
            # the shift transform sigma -> s*sigma / (1 + (s-1)*sigma)
            s = sched.config.shift
            sig = np.asarray(ts_list, np.float64) / 1000.0
            expect = s * sig / (1 + (s - 1) * sig) * 1000.0
        else:
            expect = ts_list
        np.testing.assert_allclose(got, expect, atol=0.5, err_msg=name)

    user_sigmas = [14.0, 5.0, 2.0, 0.7, 0.1]
    for name in ("euler", "euler_a", "DPM++ 2M", "DPM++ 2M Karras",
                 "DPM++ 2M SDE Karras", "uni_pc"):
        sched = make_scheduler(name)
        plan = sched.plan(50, sigmas=user_sigmas)
        assert plan.num_steps == 5, name
        np.testing.assert_allclose(
            np.asarray(plan.sigmas)[:5], user_sigmas, rtol=1e-6, err_msg=name
        )
        # terminal sigma appended, timesteps descending
        ts = np.asarray(plan.timesteps)
        assert (np.diff(ts) < 0).all(), name
        with pytest.raises(ValueError):
            sched.plan(50, timesteps=ts_list, sigmas=user_sigmas)

    for name in ("DDIM", "PNDM", "DDPM", "LCM"):
        with pytest.raises(ValueError, match="custom `sigmas`"):
            make_scheduler(name).plan(50, sigmas=user_sigmas)


def test_custom_sigmas_oracle_convergence():
    """A DPM++ run driven by a user sigma list still converges to the
    point-mass oracle (same check as test_point_mass_oracle)."""
    import jax

    sched = make_scheduler("DPM++ 2M")
    full = np.asarray(sched.plan(10).sigmas)[:10]
    plan = sched.plan(10, sigmas=full)  # user list == default grid
    ref_plan = sched.plan(10)
    np.testing.assert_allclose(
        np.asarray(plan.sigmas), np.asarray(ref_plan.sigmas), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(plan.timesteps), np.asarray(ref_plan.timesteps), atol=1.0
    )


def test_heun_order2_plan_slicing():
    """img2img strength / denoising_start slicing must land on Heun pair
    boundaries (diffusers slices `t_start * scheduler.order` interleaved
    entries), so the sliced scan starts on a predictor stage."""
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    pipe = StableDiffusionUnifiedPipeline()
    sched = make_scheduler("heun")

    plan, t_start = pipe.get_timesteps(sched, 8, strength=0.5,
                                       denoising_start=None)
    assert t_start == 8  # 4 sampler steps * order 2
    assert plan.num_steps == 2 * 4 - 1  # predictor-led interleave remains
    ts = np.asarray(plan.timesteps)
    # local entry 0 is a lone predictor; every later timestep appears twice
    assert ts[0] != ts[1] and (ts[1::2] == ts[2::2]).all()

    # denoising_start: remaining count forced odd (starts on a predictor)
    plan2, t2 = pipe.get_timesteps(sched, 8, strength=1.0,
                                   denoising_start=0.5)
    assert plan2.num_steps % 2 == 1
    ts2 = np.asarray(plan2.timesteps)
    assert ts2[0] != ts2[1] if plan2.num_steps > 1 else True


def test_heun_img2img_pipeline_runs():
    """Heun + img2img through the real pipeline (sliced interleaved plan)."""
    import sys

    sys.path.insert(0, "tests")
    from helpers import make_tiny_model
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    model = make_tiny_model("sd15", scheduler_name="heun")
    pipe = StableDiffusionUnifiedPipeline()
    out = pipe(model, prompt="a cat", height=32, width=32,
               num_inference_steps=4, seed=3)
    assert np.isfinite(out.images).all()
    img = np.zeros((32, 32, 3), np.uint8)
    out2 = pipe(model, prompt="a cat", image=img, strength=0.5,
                height=32, width=32, num_inference_steps=4, seed=3)
    assert np.isfinite(out2.images).all()


def test_lms_pipeline_runs():
    import sys

    sys.path.insert(0, "tests")
    from helpers import make_tiny_model
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    model = make_tiny_model("sd15", scheduler_name="lms")
    pipe = StableDiffusionUnifiedPipeline()
    out = pipe(model, prompt="a cat", height=32, width=32,
               num_inference_steps=5, seed=3)
    assert np.isfinite(out.images).all()

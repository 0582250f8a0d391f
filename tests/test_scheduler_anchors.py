"""Independent full-denoise-loop anchors for EVERY scheduler family.

Round-2 verdict item 1: the scheduler switch is the largest user-visible
numerics surface, and round-1's advisor found two real bugs in self-designed
oracle tests (LCM scaling, Karras sigma range).  Each test here runs our
COMPILED `_denoise` scan (CFG combine + scheduler step + UNet forwards,
pipelines/unified.py) against an independent numpy/torch loop written
directly from the published update rules — Karras et al. 2022 (Euler /
ancestral / sigma ramp), Lu et al. 2022 (DPM-Solver++ 2M, ODE + SDE), Liu
et al. 2022 (PNDM/PLMS), Zhao et al. 2023 (UniPC, general-order with
np.linalg solves vs our closed-form 2x2), Luo et al. 2023 (LCM boundary
scalings), rectified flow (SD3 FlowMatch) — with grid conventions as
documented for the correspondingly named diffusers classes so real
checkpoints sample identically.  The model is the independent torch
MirrorUNet fed through the real converter (tests/torch_mirror.py), exactly
like the existing DDIM anchor (test_parity.py:60).

Stochastic families consume bit-identical injected noise: the mirror draws
each step's noise from the SAME jax PRNG key the compiled scan consumes
(schedulers/common.step_noise with a scalar per-step key).

Bar (per VERDICT round 2): per-family fp32 full-loop MSE < 1e-8.

Ref: scheduler switch /root/reference/models/stable_diffusion.py:199-227,
denoise loop /root/reference/pipelines/sd_unified_pipeline.py:465-507.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stablediffusion_tpu.core.config import SchedulerConfig, tiny_unet_config
from stablediffusion_tpu.pipelines.unified import _denoise
from stablediffusion_tpu.schedulers import make_scheduler

from test_torch_mirror import MirrorUNet, _nchw, _params_from_torch

G = 7.5  # CFG scale (arbitrary; exercised identically on both sides)
SHAPE = (1, 16, 16, 4)


@pytest.fixture(scope="module")
def rig():
    torch.manual_seed(0)
    cfg = tiny_unet_config()
    mirror = MirrorUNet(cfg).eval()
    params = _params_from_torch(mirror)
    rng = np.random.default_rng(5)
    lat0 = rng.standard_normal(SHAPE).astype(np.float32)
    emb = rng.standard_normal((2, 77, cfg.cross_attention_dim)).astype(
        np.float32
    )
    return cfg, mirror, params, lat0, emb


def _ours(rig, name, steps, overrides=None):
    """Run OUR compiled scan: scheduler plan + `_denoise` jit."""
    cfg, _, params, lat0, emb = rig
    sched = make_scheduler(name, SchedulerConfig(**(overrides or {})))
    plan = sched.plan(steps)
    keys = jax.random.split(jax.random.key(0), plan.num_steps)
    # the pipeline scales txt2img initial noise by init_noise_sigma
    # (fp32, like pipelines/unified.py); the mirror starts from the SAME
    # fp32 state and asserts its own f64 init sigma agrees
    lat_init = (lat0 * np.float32(plan.init_noise_sigma)).astype(np.float32)
    out = _denoise(
        params, jnp.asarray(lat_init), jnp.asarray(emb), plan, keys,
        G, 0.0, None, None, None, None, None,
        unet_config=cfg, scheduler=sched, do_cfg=True,
        inpaint_mode="none", use_rescale=False,
    )
    return np.asarray(out, np.float32), plan, keys, lat_init


def _eval_eps(mirror, emb, x_nhwc, t):
    """One CFG-combined model evaluation, fp32 exactly like the scan."""
    x32 = np.ascontiguousarray(x_nhwc, dtype=np.float32)
    with torch.no_grad():
        pred = mirror(
            _nchw(np.concatenate([x32, x32], 0)),
            torch.tensor([np.float32(t)] * 2),
            torch.from_numpy(emb),
        )
    u, c = pred.chunk(2, 0)
    return (u + G * (c - u)).permute(0, 2, 3, 1).numpy().astype(np.float64)


def _noise(keys, i):
    """The exact noise the compiled scan draws at step i."""
    return np.asarray(jax.random.normal(keys[i], SHAPE), np.float64)


def _tables():
    """SD scaled_linear betas -> cumulative alphas -> k-sigma table (f64)."""
    betas = (
        np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    )
    ac = np.cumprod(1.0 - betas)
    return ac, np.sqrt((1.0 - ac) / ac)


def _check(ours, theirs, plan, mirror_ts, label):
    np.testing.assert_allclose(
        np.asarray(plan.timesteps, np.float64),
        np.asarray(mirror_ts, np.float64),
        rtol=1e-5, atol=2e-4, err_msg=f"{label}: timestep grid mismatch",
    )
    mse = float(np.mean((ours.astype(np.float64) - theirs) ** 2))
    assert mse < 1e-8, f"{label}: full-loop MSE vs independent mirror = {mse}"


# ---------------------------------------------------------------------------
# Euler family (Karras et al. 2022, k-diffusion conventions)
# ---------------------------------------------------------------------------


def _euler_grid(N):
    ac, fs = _tables()
    ratio = 1000 // N
    ts = (np.arange(N) * ratio).round()[::-1].astype(np.float64) + 1
    sig = np.interp(ts, np.arange(1000), fs)
    return ts, np.concatenate([sig, [0.0]])


def test_euler_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "euler", N)
    ts, sig = _euler_grid(N)
    # leading spacing: init sigma = sqrt(sigma_max^2 + 1)
    init = float(np.sqrt(sig.max() ** 2 + 1.0))
    assert abs(float(plan.init_noise_sigma) - init) < 1e-4 * init
    x = lat_init.astype(np.float64)
    for i in range(N):
        s = sig[i]
        eps = _eval_eps(mirror, emb, x / np.sqrt(s * s + 1.0), ts[i])
        x0 = x - s * eps
        x = x + (x - x0) / s * (sig[i + 1] - s)
    _check(ours, x, plan, ts, "euler")


def test_euler_ancestral_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "euler_a", N)
    ts, sig = _euler_grid(N)
    x = lat_init.astype(np.float64)
    for i in range(N):
        s, sn = sig[i], sig[i + 1]
        eps = _eval_eps(mirror, emb, x / np.sqrt(s * s + 1.0), ts[i])
        x0 = x - s * eps
        su2 = sn**2 * (s**2 - sn**2) / s**2
        su = np.sqrt(max(su2, 0.0))
        sd = np.sqrt(max(sn**2 - su2, 0.0))
        x = x + (x - x0) / s * (sd - s)
        x = x + _noise(keys, i) * su  # identical per-step injected noise
    _check(ours, x, plan, ts, "euler_a")


def test_heun_full_loop(rig):
    """Heun predictor-corrector (k-diffusion sample_heun, churn 0): each
    output step is an Euler predictor plus a trapezoidal corrector evaluated
    at the NEXT (t, sigma); the final step to sigma 0 stays Euler-only.  The
    compiled side runs the interleaved 2N-1-entry plan."""
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "heun", N)
    ts, sig = _euler_grid(N)
    assert plan.num_steps == 2 * N - 1 and plan.order == 2
    x = lat_init.astype(np.float64)
    for i in range(N):
        s, sn = sig[i], sig[i + 1]
        eps = _eval_eps(mirror, emb, x / np.sqrt(s * s + 1.0), ts[i])
        x0 = x - s * eps
        d1 = (x - x0) / s
        dt = sn - s
        if sn == 0.0:  # last step: no model eval at sigma 0
            x = x + d1 * dt
        else:
            xp = x + d1 * dt
            eps2 = _eval_eps(
                mirror, emb, xp / np.sqrt(sn * sn + 1.0), ts[i + 1]
            )
            x0b = xp - sn * eps2
            d2 = (xp - x0b) / sn
            x = x + 0.5 * (d1 + d2) * dt
    mirror_ts = np.concatenate([ts[:1], np.repeat(ts[1:], 2)])
    _check(ours, x, plan, mirror_ts, "heun")


def test_lms_full_loop(rig):
    """LMS / Adams-Bashforth 4 with order warm-up: the Lagrange-basis
    integrals here use Gauss-Legendre quadrature (exact for cubics) —
    independent of the analytic monomial expansion in schedulers/lms.py."""
    _, mirror, _, _, emb = rig
    N = 7  # deep enough to exercise the full order-4 tail
    ours, plan, keys, lat_init = _ours(rig, "lms", N)
    ts, sig = _euler_grid(N)
    nodes, wts = np.polynomial.legendre.leggauss(5)

    def lms_coeff(order, t, j):
        def basis(tau):
            prod = np.ones_like(tau)
            for k in range(order):
                if k == j:
                    continue
                prod = prod * (tau - sig[t - k]) / (sig[t - j] - sig[t - k])
            return prod

        a, b = sig[t], sig[t + 1]
        xm, xr = 0.5 * (a + b), 0.5 * (b - a)
        return float(np.sum(wts * basis(xm + xr * nodes)) * xr)

    x = lat_init.astype(np.float64)
    derivs = []
    for i in range(N):
        s = sig[i]
        eps = _eval_eps(mirror, emb, x / np.sqrt(s * s + 1.0), ts[i])
        x0 = x - s * eps
        derivs = (derivs + [(x - x0) / s])[-4:]
        order = min(i + 1, 4)
        coeffs = [lms_coeff(order, i, j) for j in range(order)]
        x = x + sum(c * d for c, d in zip(coeffs, reversed(derivs)))
    _check(ours, x, plan, ts, "lms")


# ---------------------------------------------------------------------------
# DPM-Solver++ 2M (Lu et al. 2022) — ODE, Karras, SDE-Karras
# ---------------------------------------------------------------------------


def _dpm_grid(N, karras):
    ac, fs = _tables()
    ratio = 1000 // (N + 1)
    ts = (np.arange(N + 1) * ratio).round()[::-1][:-1].astype(np.float64) + 1
    sig = np.interp(ts, np.arange(1000), fs)
    if karras:
        smin, smax = float(sig[-1]), float(sig[0])
        ramp = np.linspace(0, 1, N)
        rho = 7.0
        sig = (
            smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))
        ) ** rho
        # fractional train-timesteps by log-sigma interpolation, rounded
        ts = np.interp(np.log(sig), np.log(fs), np.arange(1000.0)).round()
    return ts, np.concatenate([sig, [0.0]])


def _alpha_sig(s):
    a = 1.0 / np.sqrt(s * s + 1.0)
    return a, s * a


def _lam(s):
    a, st = _alpha_sig(s)
    return np.log(a) - np.log(np.maximum(st, 1e-300))


def _dpm_mirror(mirror, emb, lat_init, keys, N, karras, sde):
    ts, sig = _dpm_grid(N, karras)
    x = lat_init.astype(np.float64)
    x0_prev = None
    for i in range(N):
        eps = _eval_eps(mirror, emb, x, ts[i])
        a_s0, st_s0 = _alpha_sig(sig[i])
        x0 = (x - st_s0 * eps) / a_s0
        a_t, st_t = _alpha_sig(sig[i + 1])
        h = _lam(sig[i + 1]) - _lam(sig[i])
        # first order at warm-up and (final_sigmas_type=zero) at the last step
        first = (i == 0) or (i == N - 1)
        if not first:
            h0 = _lam(sig[i]) - _lam(sig[i - 1])
            D1 = (x0 - x0_prev) / (h0 / h)
        if sde:
            e_h, e_2h = np.exp(-h), np.exp(-2.0 * h)
            xt = (
                (st_t / st_s0 * e_h) * x
                + a_t * (1.0 - e_2h) * x0
                + st_t * np.sqrt(max(1.0 - e_2h, 0.0)) * _noise(keys, i)
            )
            if not first:
                xt = xt + 0.5 * a_t * (1.0 - e_2h) * D1
        else:
            em1 = np.exp(-h) - 1.0
            xt = (st_t / st_s0) * x - a_t * em1 * x0
            if not first:
                xt = xt - 0.5 * a_t * em1 * D1
        x0_prev, x = x0, xt
    return x, ts


def test_dpmpp_2m_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "DPM++ 2M", N)
    x, ts = _dpm_mirror(mirror, emb, lat_init, keys, N, karras=False, sde=False)
    _check(ours, x, plan, ts, "DPM++ 2M")


def test_dpmpp_2m_karras_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "DPM++ 2M Karras", N)
    x, ts = _dpm_mirror(mirror, emb, lat_init, keys, N, karras=True, sde=False)
    _check(ours, x, plan, ts, "DPM++ 2M Karras")


def test_dpmpp_2m_sde_karras_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "DPM++ 2M SDE Karras", N)
    x, ts = _dpm_mirror(mirror, emb, lat_init, keys, N, karras=True, sde=True)
    _check(ours, x, plan, ts, "DPM++ 2M SDE Karras")


def _dpm3_mirror(mirror, emb, lat_init, keys, N, karras, sde):
    """Third-order multistep from the published rules: Lu et al. 2022
    eq. (3.3) (ODE) / k-diffusion sample_dpmpp_3m_sde with eta=1 (SDE),
    with diffusers' lower-order warm-up/tail convention (N < 15: first at
    i in {0, N-1}, second-midpoint at i in {1, N-2})."""
    ts, sig = _dpm_grid(N, karras)
    x = lat_init.astype(np.float64)
    x0_hist = []
    for i in range(N):
        eps = _eval_eps(mirror, emb, x, ts[i])
        a_s0, st_s0 = _alpha_sig(sig[i])
        x0 = (x - st_s0 * eps) / a_s0
        a_t, st_t = _alpha_sig(sig[i + 1])
        h = _lam(sig[i + 1]) - _lam(sig[i])
        order = 3
        if i == 0 or i == N - 1:
            order = 1
        elif i == 1 or i == N - 2:
            order = 2
        if sde:
            e_h, e_2h = np.exp(-h), np.exp(-2.0 * h)
            xt = (
                (st_t / st_s0 * e_h) * x
                + a_t * (1.0 - e_2h) * x0
                + st_t * np.sqrt(max(1.0 - e_2h, 0.0)) * _noise(keys, i)
            )
        else:
            em1 = np.exp(-h) - 1.0
            xt = (st_t / st_s0) * x - a_t * em1 * x0
        if order >= 2:
            h0 = _lam(sig[i]) - _lam(sig[i - 1])
            r0 = h0 / h
            D1_0 = (x0 - x0_hist[-1]) / r0
            if order == 2:
                if sde:
                    xt = xt + 0.5 * a_t * (1.0 - e_2h) * D1_0
                else:
                    xt = xt - 0.5 * a_t * em1 * D1_0
            else:
                h1 = _lam(sig[i - 1]) - _lam(sig[i - 2])
                r1 = h1 / h
                D1_1 = (x0_hist[-1] - x0_hist[-2]) / r1
                D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
                D2 = (D1_0 - D1_1) / (r0 + r1)
                if sde:
                    h_eta = 2.0 * h
                    phi2 = (e_2h - 1.0) / h_eta + 1.0
                    phi3 = phi2 / h_eta - 0.5
                    xt = xt + a_t * (phi2 * D1 - phi3 * D2)
                else:
                    xt = xt + a_t * (em1 / h + 1.0) * D1 - a_t * (
                        (em1 + h) / h**2 - 0.5
                    ) * D2
        x0_hist.append(x0)
        x = xt
    return x, ts


def test_dpmpp_3m_sde_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 8  # third order active at i in [2, N-3]
    ours, plan, keys, lat_init = _ours(rig, "DPM++ 3M SDE", N)
    x, ts = _dpm3_mirror(mirror, emb, lat_init, keys, N, karras=False,
                         sde=True)
    _check(ours, x, plan, ts, "DPM++ 3M SDE")


def test_dpmpp_3m_sde_karras_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 8
    ours, plan, keys, lat_init = _ours(rig, "DPM++ 3M SDE Karras", N)
    x, ts = _dpm3_mirror(mirror, emb, lat_init, keys, N, karras=True,
                         sde=True)
    _check(ours, x, plan, ts, "DPM++ 3M SDE Karras")


def test_dpmpp_3m_ode_full_loop(rig):
    """Order-3 ODE path (Lu et al. eq. 3.3) via solver_order override."""
    _, mirror, _, _, emb = rig
    N = 8
    ours, plan, keys, lat_init = _ours(rig, "DPM++ 2M", N,
                                       overrides={"solver_order": 3})
    x, ts = _dpm3_mirror(mirror, emb, lat_init, keys, N, karras=False,
                         sde=False)
    _check(ours, x, plan, ts, "DPM++ 3M (ODE)")


# ---------------------------------------------------------------------------
# PNDM / PLMS (Liu et al. 2022), skip_prk_steps=True convention
# ---------------------------------------------------------------------------


def test_pndm_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 8  # deep enough to exercise the 4th-order AB tail
    ours, plan, keys, lat_init = _ours(rig, "PNDM", N)
    ac, _ = _tables()
    ratio = 1000 // N
    base = ((np.arange(N) * ratio).round() + 1).astype(int)  # ascending
    plms_ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    final_alpha = ac[0]  # set_alpha_to_one=False

    x = lat_init.astype(np.float64)
    ets, counter, cur_sample = [], 0, None
    for t in plms_ts:
        t = int(t)
        eps = _eval_eps(mirror, emb, x, t)
        prev_t, t_use = t - ratio, t
        if counter != 1:
            ets = ets[-3:] + [eps]
        else:  # warm-up re-evaluation at the duplicated timestep
            prev_t, t_use = t, t + ratio
        if len(ets) == 1 and counter == 0:
            e, cur_sample = eps, x
        elif len(ets) == 1 and counter == 1:
            e, x = (eps + ets[-1]) / 2.0, cur_sample
        elif len(ets) == 2:
            e = (3.0 * ets[-1] - ets[-2]) / 2.0
        elif len(ets) == 3:
            e = (23.0 * ets[-1] - 16.0 * ets[-2] + 5.0 * ets[-3]) / 12.0
        else:
            e = (
                55.0 * ets[-1] - 59.0 * ets[-2] + 37.0 * ets[-3] - 9.0 * ets[-4]
            ) / 24.0
        a_t = ac[t_use]
        a_prev = ac[prev_t] if prev_t >= 0 else final_alpha
        coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1.0 - a_prev) + np.sqrt(
            a_t * (1.0 - a_t) * a_prev
        )
        x = coeff * x - (a_prev - a_t) * e / denom
        counter += 1
    _check(ours, x, plan, plms_ts.astype(np.float64), "PNDM")


# ---------------------------------------------------------------------------
# UniPC (Zhao et al. 2023) — general-order mirror with np.linalg solves
# ---------------------------------------------------------------------------


def _uni_Rb(rks, hh, order):
    """R matrix / b vector of the UniPC linear system (B(h)=expm1(hh), bh2)."""
    h_phi_1 = np.expm1(hh)
    B_h = h_phi_1
    h_phi_k = h_phi_1 / hh - 1.0
    R, b = [], []
    fac = 1.0
    for k in range(1, order + 1):
        R.append(np.power(rks, k - 1))
        b.append(h_phi_k * fac / B_h)
        fac *= k + 1
        h_phi_k = h_phi_k / hh - 1.0 / fac
    return np.array(R), np.array(b), h_phi_1, B_h


def test_unipc_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "uni_pc", N)
    ts, sig = _dpm_grid(N, karras=False)  # same anchor grid as DPM

    x = lat_init.astype(np.float64)
    m_hist = []  # x0 predictions, newest LAST (diffusers model_outputs)
    last_sample, this_order = None, None
    for i in range(N):
        eps = _eval_eps(mirror, emb, x, ts[i])
        a_i, st_i = _alpha_sig(sig[i])
        m_conv = (x - st_i * eps) / a_i  # pre-corrector conversion

        if i > 0:  # ---- corrector over [sigma_{i-1} -> sigma_i] -----------
            order = this_order
            m0 = m_hist[-1]
            lam_t, lam_s0 = _lam(sig[i]), _lam(sig[i - 1])
            h = lam_t - lam_s0
            rks, D1s = [], []
            for k in range(1, order):
                mi = m_hist[-(k + 1)]
                rk = (_lam(sig[i - 1 - k]) - lam_s0) / h
                rks.append(rk)
                D1s.append((mi - m0) / rk)
            rks.append(1.0)
            R, b, h_phi_1, B_h = _uni_Rb(np.array(rks), -h, order)
            rhos_c = np.array([0.5]) if order == 1 else np.linalg.solve(R, b)
            a_t, st_t = _alpha_sig(sig[i])
            _, st_s0 = _alpha_sig(sig[i - 1])
            x_t_ = (st_t / st_s0) * last_sample - a_t * h_phi_1 * m0
            corr = sum(r * d for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0.0
            x = x_t_ - a_t * B_h * (corr + rhos_c[-1] * (m_conv - m0))

        m_hist = (m_hist + [m_conv])[-3:]
        this_order = min(2, N - i, i + 1)  # solver_order, lower_order_final
        last_sample = x

        # ---- predictor over [sigma_i -> sigma_{i+1}] ----------------------
        order = this_order
        m0 = m_hist[-1]
        lam_t, lam_s0 = _lam(sig[i + 1]), _lam(sig[i])
        h = lam_t - lam_s0
        rks, D1s = [], []
        for k in range(1, order):
            mi = m_hist[-(k + 1)]
            rk = (_lam(sig[i - k]) - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = _uni_Rb(np.array(rks), -h, order)
        if D1s:
            rhos_p = (
                np.array([0.5])
                if order == 2
                else np.linalg.solve(R[:-1, :-1], b[:-1])
            )
            pred = sum(r * d for r, d in zip(rhos_p, D1s))
        else:
            pred = 0.0
        a_t, st_t = _alpha_sig(sig[i + 1])
        _, st_s0 = _alpha_sig(sig[i])
        x = (st_t / st_s0) * x - a_t * h_phi_1 * m0 - a_t * B_h * pred
    _check(ours, x, plan, ts, "uni_pc")


# ---------------------------------------------------------------------------
# LCM (Luo et al. 2023) boundary scalings + ancestral re-noising
# ---------------------------------------------------------------------------


def test_lcm_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 4
    ours, plan, keys, lat_init = _ours(rig, "LCM", N)
    ac, _ = _tables()
    origin = np.arange(1, 51) * 20 - 1  # 50-step origin grid
    idx = np.floor(np.linspace(0, 50, N, endpoint=False)).astype(int)
    ts = origin[::-1][idx]

    x = lat_init.astype(np.float64)
    for i, t in enumerate(ts):
        t = int(t)
        eps = _eval_eps(mirror, emb, x, t)
        a = ac[t]
        x0 = (x - np.sqrt(1.0 - a) * eps) / np.sqrt(a)
        st = t * 10.0  # timestep_scaling
        c_skip = 0.25 / (st**2 + 0.25)  # sigma_data = 0.5
        c_out = st / np.sqrt(st**2 + 0.25)
        denoised = c_out * x0 + c_skip * x
        if i < N - 1:
            ap = ac[int(ts[i + 1])]
            x = np.sqrt(ap) * denoised + np.sqrt(1.0 - ap) * _noise(keys, i)
        else:
            x = denoised
    _check(ours, x, plan, ts.astype(np.float64), "LCM")


# ---------------------------------------------------------------------------
# FlowMatchEuler (SD3 rectified flow)
# ---------------------------------------------------------------------------


def test_flow_match_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "FlowMatchEuler", N)
    sh = 3.0
    shift = lambda s: sh * s / (1.0 + (sh - 1.0) * s)  # noqa: E731
    train = shift(np.arange(1000, 0, -1, dtype=np.float64) / 1000.0)
    smin, smax = float(train[-1]), float(train[0])
    # linspace over shifted range, mapped to sigmas and shifted again
    # (documented FlowMatchEulerDiscreteScheduler behavior)
    ts_lin = np.linspace(1000.0 * smax, 1000.0 * smin, N)
    sig = shift(ts_lin / 1000.0)
    ts = sig * 1000.0
    sig = np.concatenate([sig, [0.0]])

    x = lat_init.astype(np.float64)
    for i in range(N):
        v = _eval_eps(mirror, emb, x, np.float32(ts[i]))
        x = x + (sig[i + 1] - sig[i]) * v
    _check(ours, x, plan, ts, "FlowMatchEuler")


# ---------------------------------------------------------------------------
# DDPM ancestral (Ho et al. 2020), fixed_small variance
# ---------------------------------------------------------------------------


def test_ddpm_full_loop(rig):
    _, mirror, _, _, emb = rig
    N = 6
    ours, plan, keys, lat_init = _ours(rig, "DDPM", N)
    ac, _ = _tables()
    ratio = 1000 // N
    ts = ((np.arange(N) * ratio).round()[::-1] + 1).astype(int)

    x = lat_init.astype(np.float64)
    for i, t in enumerate(ts):
        t = int(t)
        eps = _eval_eps(mirror, emb, x, t)
        prev_t = t - ratio
        a_t = ac[t]
        a_prev = ac[prev_t] if prev_t >= 0 else 1.0
        cur_a = a_t / a_prev
        cur_b = 1.0 - cur_a
        x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
        mean = (np.sqrt(a_prev) * cur_b / (1.0 - a_t)) * x0 + (
            np.sqrt(cur_a) * (1.0 - a_prev) / (1.0 - a_t)
        ) * x
        var = max((1.0 - a_prev) / (1.0 - a_t) * cur_b, 1e-20)
        if t > 0:
            x = mean + np.sqrt(var) * _noise(keys, i)
        else:
            x = mean
    _check(ours, x, plan, ts.astype(np.float64), "DDPM")

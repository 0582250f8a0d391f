"""Conv layout experiment (VERDICT r2 item 2 tail): is NHWC+HWIO direct conv
the right formulation for the UNet's 3x3 resnet convs on this chip, or does a
different layout / formulation hide a >5% win?

Candidates, per UNet conv shape (both SD1.5 512² and SDXL 1024² levels):
  * nhwc    — current default: lax.conv_general_dilated ("NHWC","HWIO","NHWC")
  * nchw    — torch-native dimension numbers ("NCHW","OIHW","NCHW"); XLA
              must either transpose or pick different internal tiling
  * im2col  — extract 3x3 patches -> one [B*H*W, 9C] x [9C, C'] matmul
              (the MXU-obvious formulation; tests whether XLA's direct conv
              lowering leaves MXU utilization on the table)
  * f32acc  — NHWC with preferred_element_type=fp32 accumulation then downcast
              (numerics-vs-speed check for the bf16 pipeline)

Timing: carry-feedback scan (output perturbs next input) so XLA cannot hoist
anything (CLAUDE.md LICM warning).  Each candidate is timed inside ONE jitted
scan; results -> benchmarks/RESULTS.json["conv_layout"].
"""

import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, x, w, iters=50, reps=3):
    """iters high enough that the ~24 ms fixed dispatch overhead of the
    tunneled backend (CLAUDE.md) is <2% of the measurement, not ~50% as at
    iters=10; min over reps."""
    def run(x0, w0):
        def body(carry, _):
            y = fn(x0 + 1e-6 * jnp.mean(carry), w0)
            return y, ()

        y0 = fn(x0, w0)
        return jax.lax.scan(body, y0, None, length=iters)[0]

    scanned = jax.jit(run)
    float(jnp.mean(scanned(x, w).astype(jnp.float32)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.mean(scanned(x, w).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_nchw(x, w):
    # x arrives NHWC, w HWIO; transposes are part of the candidate's cost
    # (a real NCHW framework would carry this layout everywhere)
    xt = x.transpose(0, 3, 1, 2)
    wt = w.transpose(3, 2, 0, 1)
    y = jax.lax.conv_general_dilated(
        xt, wt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y.transpose(0, 2, 3, 1)


def conv_im2col(x, w):
    B, H, W, C = x.shape
    kh, kw, _, Co = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jax.lax.conv_general_dilated_patches(
        xp, (kh, kw), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H, W, C*kh*kw] (feature-major ordering)
    # conv_general_dilated_patches orders features as [C, kh, kw]
    wm = w.transpose(2, 0, 1, 3).reshape(C * kh * kw, Co)
    y = jnp.einsum(
        "bhwk,ko->bhwo", patches, wm, preferred_element_type=x.dtype
    )
    return y


def conv_f32acc(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


SHAPES = [
    # (tag, B, H, C_in, C_out) — CFG-doubled UNet batches
    ("sd15_L1", 16, 64, 320, 320),
    ("sd15_L2", 16, 32, 640, 640),
    ("sd15_L3", 16, 16, 1280, 1280),
    ("sdxl_L1", 4, 128, 320, 320),
    ("sdxl_L2", 4, 64, 640, 640),
    ("sdxl_L3", 4, 32, 1280, 1280),
]

CANDIDATES = [
    ("nhwc", conv_nhwc),
    ("nchw", conv_nchw),
    ("im2col", conv_im2col),
    ("f32acc", conv_f32acc),
]


def main():
    from stablediffusion_tpu.utils.bench_utils import record_result

    results = {}
    for tag, B, H, Ci, Co in SHAPES:
        kx, kw = jax.random.split(jax.random.key(0))
        x = jax.random.normal(kx, (B, H, H, Ci), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, Ci, Co), jnp.bfloat16) * 0.02
        flops = 2 * B * H * H * Ci * Co * 9
        row = {}
        for name, fn in CANDIDATES:
            try:
                ms = timeit(fn, x, w) * 1e3
                row[name] = {
                    "ms": round(ms, 3),
                    "tf_s": round(flops / (ms * 1e-3) / 1e12, 1),
                }
            except Exception as e:
                row[name] = f"fail({type(e).__name__})"
        results[tag] = row
        print(json.dumps({tag: row}), flush=True)

    record_result(
        "conv_layout",
        {"metric": "conv_layout_ms", "value": 0, "unit": "ms/call",
         "detail": results},
    )


if __name__ == "__main__":
    main()

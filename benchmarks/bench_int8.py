"""int8 MXU microbench — is there a 2x matmul path on this chip?

v5e's spec sheet lists 394 TOPS int8 vs 197 TFLOP/s bf16: if XLA lowers
`int8 x int8 -> int32` dots/convs onto the doubled-rate MXU path, weight+
activation quantization (W8A8) roughly doubles the compute ceiling of the
UNet denoise loop (the reference's entire serving cost,
/root/reference/pipelines/sd_unified_pipeline.py:475-482).  This bench
answers the prerequisite question with measured numbers per UNet-
representative shape before any quantized layer code is built on top:

  * bf16 x bf16 -> f32-accum matmul (today's path) in TF/s
  * int8 x int8 -> int32 matmul in TOP/s
  * the same int8 dot with the real W8A8 epilogue (int32 -> f32 scale ->
    bf16) — what a quantized Linear actually costs
  * 3x3 convs at SD1.5 resnet shapes, bf16 vs int8

Timing: carry-feedback scan (bench_conv_layout.py pattern) so XLA cannot
hoist the constant-input op out of the loop (CLAUDE.md warning).

Results -> RESULTS.json["int8_mxu"].
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, w, iters=50, reps=3, perturb=None):
    perturb = perturb or (lambda x0, carry: x0 + 1e-6 * jnp.mean(carry))

    def run(x0, w0):
        def body(carry, _):
            y = fn(perturb(x0, carry), w0)
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


def perturb_int8(x0, carry):
    # flip the low bit of one element per iteration — forces re-execution
    # without changing the op's cost profile
    bit = (jnp.sum(carry.astype(jnp.int32)) % 2).astype(jnp.int8)
    return x0.at[0, 0].add(bit) if x0.ndim == 2 else x0.at[0, 0, 0, 0].add(bit)


def mm_bf16(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def mm_int8(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def mm_int8_epilogue(x, w):
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # per-output-channel dequant scale, the real W8A8 epilogue
    scale = jnp.full((w.shape[1],), 0.01, jnp.float32)
    return (acc.astype(jnp.float32) * scale).astype(jnp.bfloat16)


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def conv_int8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def main():
    from stablediffusion_tpu.utils.bench_utils import record_result

    rng = np.random.default_rng(0)
    results = {}

    # (M, K, N): UNet attention/GEGLU/proj shapes at batch 8, 512^2
    mm_shapes = [
        (8 * 4096, 320, 320),
        (8 * 4096, 320, 2560),
        (8 * 4096, 2560, 320),
        (8 * 1024, 640, 640),
        (8 * 256, 1280, 1280),
        (8 * 256, 1280, 10240),
    ]
    for M, K, N in mm_shapes:
        xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        flops = 2.0 * M * K * N
        row = {}
        t = timeit(mm_bf16, xb, wb)
        row["bf16_tflops"] = round(flops / t / 1e12, 1)
        t = timeit(mm_int8, xi, wi, perturb=perturb_int8)
        row["int8_tops"] = round(flops / t / 1e12, 1)
        t = timeit(mm_int8_epilogue, xi, wi, perturb=perturb_int8)
        row["int8_dequant_tops"] = round(flops / t / 1e12, 1)
        key = f"mm_M{M}_K{K}_N{N}"
        results[key] = row
        print(json.dumps({key: row}), flush=True)

    # 3x3 convs at SD1.5 batch-8 resnet shapes
    conv_shapes = [
        (8, 64, 320, 320),
        (8, 32, 640, 640),
        (8, 16, 1280, 1280),
    ]
    for B, HW, Cin, Cout in conv_shapes:
        xb = jnp.asarray(rng.standard_normal((B, HW, HW, Cin)), jnp.bfloat16)
        wb = jnp.asarray(
            rng.standard_normal((3, 3, Cin, Cout)) * 0.02, jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, (B, HW, HW, Cin)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (3, 3, Cin, Cout)), jnp.int8)
        flops = 2.0 * B * HW * HW * 9 * Cin * Cout
        row = {}
        t = timeit(conv_bf16, xb, wb, iters=30)
        row["bf16_tflops"] = round(flops / t / 1e12, 1)
        try:
            t = timeit(conv_int8, xi, wi, iters=30, perturb=perturb_int8)
            row["int8_tops"] = round(flops / t / 1e12, 1)
        except Exception as e:
            row["int8_tops"] = f"fail({type(e).__name__})"
        key = f"conv_B{B}_{HW}x{HW}_{Cin}->{Cout}"
        results[key] = row
        print(json.dumps({key: row}), flush=True)

    payload = {
        "metric": "int8_vs_bf16_mxu_rate",
        "unit": "TF/s (bf16) vs TOP/s (int8)",
        "value": 0,
        "detail": results,
    }
    record_result("int8_mxu", payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

"""Decision microbench: int8 vs bf16 matmul throughput on the target chip.

The v5e MXU has 2x peak int8 throughput vs bf16 (394 vs 197 TOPS). Whether a
post-training-quantized eval/serving path is worth building depends on whether
XLA actually lowers `lax.dot_general(int8, int8, preferred_element_type=int32)`
onto that path at THIS model's eval shapes — and on whether the dynamic
activation-quantization overhead (abs-max + scale + round per row) eats the
win. This script answers both with interleaved A/Bs at the flagship eval
matmul shapes (B=16 -> M = 16*2911 sequences, T=3 tokens).

Timing discipline per CLAUDE.md: hard host readback (the tunneled backend's
block_until_ready returns at enqueue), min-over-chunks, arms interleaved in
one process.
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Flagship eval-forward backbone shapes: rows = B*N*T = 16*2911*3.
ROWS = 16 * 2911 * 3
SHAPES = {
    "qkv": (ROWS, 768, 2304),
    "attn_proj": (ROWS, 768, 768),
    "mlp_fc": (ROWS, 768, 3072),
    "mlp_proj": (ROWS, 3072, 768),
}


@jax.jit
def mm_bf16(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


@jax.jit
def mm_bf16_out(a, w):
    # bf16 result (fp32 MXU accumulation either way): halves the result-write
    # traffic vs the f32-out arm — the achievable-ceiling reference for model
    # matmuls, whose results feed bf16 consumers after fusion
    return jnp.dot(a, w)


@jax.jit
def mm_int8_static(aq, wq):
    # both operands pre-quantized: the pure MXU-int8 ceiling
    return jax.lax.dot_general(
        aq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


@jax.jit
def mm_int8_dynamic(a_bf16, wq, w_scale):
    # realistic serving arm: dynamic per-row activation quant fused in front of
    # the int8 dot, dequant fused behind it
    amax = jnp.max(jnp.abs(a_bf16.astype(jnp.float32)), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-8) / 127.0
    aq = jnp.clip(
        jnp.round(a_bf16.astype(jnp.float32) / a_scale), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        aq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * a_scale * w_scale[None, :]


def time_arm(fn, args, chunk=10, n_chunks=4) -> float:
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + hard sync
    best = float("inf")
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / chunk)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=10)
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--bf16-ceiling", action="store_true",
                   help="only measure the bf16 f32-out vs bf16-out arms (the "
                        "achievable matmul ceiling for scripts/roofline.py)")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for name, (m, k, n) in SHAPES.items():
        a = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.bfloat16)
        wq_np = np.clip(
            np.round(np.asarray(w, dtype=np.float32) * 64.0), -127, 127
        )
        wq = jnp.asarray(wq_np, dtype=jnp.int8)
        w_scale = jnp.full((n,), 1.0 / 64.0, dtype=jnp.float32)
        aq = jnp.asarray(
            np.clip(rng.integers(-127, 128, (m, k)), -127, 127), dtype=jnp.int8
        )

        flops = 2 * m * k * n
        t_bf = time_arm(mm_bf16, (a, w), args.chunk, args.chunks)
        if args.bf16_ceiling:
            t_bo = time_arm(mm_bf16_out, (a, w), args.chunk, args.chunks)
            print(
                f"{name:10s} ({m}x{k}x{n}): "
                f"bf16/f32out {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s) | "
                f"bf16/bf16out {t_bo*1e3:7.3f} ms ({flops/t_bo/1e12:6.1f} TF/s, "
                f"{t_bf/t_bo:4.2f}x)"
            )
            continue
        t_i8 = time_arm(mm_int8_static, (aq, wq), args.chunk, args.chunks)
        t_dyn = time_arm(mm_int8_dynamic, (a, wq, w_scale), args.chunk, args.chunks)
        print(
            f"{name:10s} ({m}x{k}x{n}): "
            f"bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s) | "
            f"int8-static {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s, "
            f"{t_bf/t_i8:4.2f}x) | "
            f"int8-dynamic {t_dyn*1e3:7.3f} ms ({t_bf/t_dyn:4.2f}x)"
        )


if __name__ == "__main__":
    main()

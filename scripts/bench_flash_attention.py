"""TPU A/B: Pallas flash-attention kernel vs the XLA einsum reference.

The shipped TEC-MoLLM configs compress 48->3 (or 336->21) tokens before the
backbone, so the Pallas kernel only has users at long-sequence variants
(T >= FLASH_MIN_SEQ = 128). This script provides the measured evidence for that
routing decision (VERDICT r1 weak #6): interleaved same-process timings
(CLAUDE.md rule 5) with hard host-readback sync (rule 1) at T in {128..1024}.

Run on the TPU:  python scripts/bench_flash_attention.py
Prints one JSON line per (T, mode) with pallas/xla ms and the speedup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--head-dim", type=int, default=64)
    p.add_argument("--seqs", type=int, nargs="+", default=[128, 256, 512, 1024])
    p.add_argument("--steps", type=int, default=10, help="timed iters per chunk")
    p.add_argument("--chunks", type=int, default=5, help="interleaved A/B rounds")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.ops.flash_attention import flash_attention, reference_attention

    dtype = jnp.dtype(args.dtype)

    def timed(fn, qkv, steps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*qkv)
        # hard sync: block_until_ready returns at enqueue on the tunneled backend
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / steps

    for t in args.seqs:
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.normal(0, 0.5, size=(args.batch, t, args.heads, args.head_dim))
        ).astype(dtype)
        qkv = (mk(), mk(), mk())

        pallas_fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
        xla_fwd = jax.jit(lambda q, k, v: reference_attention(q, k, v, causal=True))

        def grad_of(fn):
            return jax.jit(
                jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2),
                         argnums=(0, 1, 2))
            )

        pallas_bwd = grad_of(lambda q, k, v: flash_attention(q, k, v, causal=True))
        xla_bwd = grad_of(lambda q, k, v: reference_attention(q, k, v, causal=True))

        # numerical check first (also compiles)
        a = np.asarray(pallas_fwd(*qkv), dtype=np.float32)
        b = np.asarray(xla_fwd(*qkv), dtype=np.float32)
        err = float(np.max(np.abs(a - b)))

        for mode, fa, fb in (
            ("fwd", pallas_fwd, xla_fwd),
            ("fwd+bwd", pallas_bwd, xla_bwd),
        ):
            if mode == "fwd+bwd":
                out = fa(*qkv)  # compile
                float(jnp.sum(out[0].astype(jnp.float32)))
                out = fb(*qkv)
                float(jnp.sum(out[0].astype(jnp.float32)))

                def sync_fn(f):
                    def g(*xs):
                        return f(*xs)[0]
                    return g

                fa, fb = sync_fn(fa), sync_fn(fb)
            best_a = best_b = float("inf")
            for _ in range(args.chunks):  # interleave: ambient load hits both
                best_a = min(best_a, timed(fa, qkv, args.steps))
                best_b = min(best_b, timed(fb, qkv, args.steps))
            print(json.dumps({
                "T": t, "mode": mode,
                "pallas_ms": round(best_a * 1e3, 3),
                "xla_ms": round(best_b * 1e3, 3),
                "speedup": round(best_b / best_a, 3),
                "max_abs_err": err,
                "backend": jax.default_backend(),
            }), flush=True)


if __name__ == "__main__":
    sys.exit(main())

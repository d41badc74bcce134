"""Fused short-sequence causal attention: one-pass Pallas TPU kernel + custom VJP.

Why this exists: the model's transformer runs at T=3 tokens (21 in the scale-up
preset's long variant, still tiny) over a huge row axis M = B*N (~23k sequences).
Round-2's unrolled XLA formulation (models/gpt2._unrolled_causal_attention) fixed
the (M, H, T, T)-layout waste, but its softmax/score/output steps still lower to
~10 separate HBM-round-tripping fusions per layer (trace r2b: the (M, T, 768) and
(M, T) f32 intermediates dominate the attention time). This kernel does the whole
thing — scores, causal softmax, optional attention dropout, weighted sum — in one
VMEM-resident pass per row block: q/k/v are read from HBM once and the output is
written once. The backward is a second one-pass kernel (recomputes the softmax in
VMEM — cheaper than storing it) wired via jax.custom_vjp.

MEASURED VERDICT (v5e, interleaved A/B, BASELINE.md): SLOWER than the XLA
unrolled path — train 143.5 vs 120.5 ms/step, eval 105.6 vs 96.8 ms — the
low-occupancy (D, H) segment matmuls and the kernel's serial dependency chain
lose to XLA's pipelined fusions at these shapes (dropout PRNG is not the cause;
eval mode has none). Kept opt-in (`TECMoLLM(fused_attn=True)`) with full tests:
the third data point (after fused_mlp and flash-attention) that XLA's own
fusion beats hand-written Mosaic kernels for this model's shapes on v5e.

Layout trick: head-wise score reductions use a constant (D, H) 0/1 "segment
matrix" S so that (q*k) @ S computes all per-head dot products on the MXU with no
(M, H, Dh) relayout, and alpha @ S^T broadcasts per-head weights back to (M, D).

Behavioral contract: numerically equivalent (max-shifted fp32 softmax, fp32
score accumulation) to the reference's torch softmax attention
(/root/reference/src/model/modules.py:156-209 via HF GPT2Attention) and to
models/gpt2._unrolled_causal_attention — exact-equality tests in
tests/test_ops.py. Attention dropout (reference attn_pdrop=0.1) is implemented
with the TPU core PRNG; it draws a DIFFERENT (still seeded-deterministic) bit
stream than flax's threefry/rbg dropout, which changes no distributional
semantics but means bitwise trajectories differ from the XLA path when
dropout > 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; q/k/v/out tiles are (BM, T, D) bf16 -> ~2.3 MB each at
# T=3, D=768. The fp32 per-token intermediates push Mosaic's scoped-VMEM stack
# past the 16 MB default limit, so the calls raise vmem_limit_bytes (v5e has
# 128 MB of physical VMEM; the 16 MB default is conservative).
_BLOCK_M = 512
_VMEM_LIMIT = 100 * 1024 * 1024
# dropout keep-decision: keep iff bits >= rate * 2^32 (uniform uint32)
_U32_SPAN = float(2**32)


def _segment_matrix(d: int, heads: int, dtype=jnp.float32) -> jnp.ndarray:
    """(D, H) 0/1 matrix with S[i, h] = 1 iff feature i belongs to head h."""
    head_dim = d // heads
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
    return (d_idx // head_dim == h_idx).astype(dtype)


class _Prng:
    """Sequential dropout-bit source with one contract: seeded, draw-order-
    deterministic uint32 streams. On TPU it wraps the core PRNG
    (pltpu.prng_seed / prng_random_bits). In interpret mode — where the core-PRNG
    primitives have no CPU lowering — it emulates the same contract with a
    counter-based splitmix/murmur-style hash, so the forward/backward
    mask-regeneration parity (same seed + same draw ORDER => same masks) is
    hermetically testable (tests/test_ops.py::TestFusedShortAttentionDropout).
    Bit VALUES differ between backends; the semantics do not."""

    def __init__(self, seed, interpret: bool):
        self.interpret = interpret
        if interpret:
            self.seed = seed.astype(jnp.uint32)
            self.counter = 0  # trace-time draw index: kernels are traced once
        else:
            pltpu.prng_seed(seed)

    def draw_bits(self, shape):
        if not self.interpret:
            return pltpu.prng_random_bits(shape)  # uint32
        n = 1
        for s in shape:
            n *= s
        idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
        z = (
            self.seed * jnp.uint32(0x9E3779B9)
            + jnp.uint32(self.counter) * jnp.uint32(0x85EBCA6B)
            + idx
        )
        self.counter += 1
        z = z ^ (z >> 16)
        z = z * jnp.uint32(0x7FEB352D)
        z = z ^ (z >> 15)
        z = z * jnp.uint32(0x846CA68B)
        z = z ^ (z >> 16)
        return z


def _dropout_mask(prng: _Prng, shape, rate: float):
    """Per-call keep mask from the sequential PRNG stream."""
    bits = prng.draw_bits(shape)
    threshold = jnp.uint32(min(int(rate * _U32_SPAN), 2**32 - 1))
    return bits >= threshold


def _fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, o_ref, *, t: int, heads: int, scale: float,
    rate: float, interpret: bool,
):
    d = q_ref.shape[-1]
    seg = _segment_matrix(d, heads)
    seg_t = seg.T
    if rate > 0.0:
        prng = _Prng(seed_ref[0] + pl.program_id(0), interpret)

    ks = [k_ref[:, s, :].astype(jnp.float32) for s in range(t)]
    vs = [v_ref[:, s, :] for s in range(t)]
    for tq in range(t):
        qt = q_ref[:, tq, :].astype(jnp.float32)
        scores = [
            jnp.dot(qt * ks[s], seg, preferred_element_type=jnp.float32) * scale
            for s in range(tq + 1)
        ]  # each (BM, H) fp32
        mx = scores[0]
        for s_val in scores[1:]:
            mx = jnp.maximum(mx, s_val)
        exps = [jnp.exp(s_val - mx) for s_val in scores]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        alphas = [e / denom for e in exps]
        if rate > 0.0:
            inv_keep = 1.0 / (1.0 - rate)
            alphas = [
                jnp.where(_dropout_mask(prng, a.shape, rate), a * inv_keep, 0.0)
                for a in alphas
            ]
        out = None
        for s in range(tq + 1):
            w = jnp.dot(alphas[s], seg_t, preferred_element_type=jnp.float32)
            term = w * vs[s].astype(jnp.float32)
            out = term if out is None else out + term
        o_ref[:, tq, :] = out.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, t: int, heads: int, scale: float, rate: float, interpret: bool,
):
    """Recompute-softmax backward. The PRNG draw ORDER matches the forward
    exactly (per tq ascending, per s ascending), so regenerated dropout masks
    are identical to the forward's."""
    d = q_ref.shape[-1]
    seg = _segment_matrix(d, heads)
    seg_t = seg.T
    if rate > 0.0:
        prng = _Prng(seed_ref[0] + pl.program_id(0), interpret)
        inv_keep = 1.0 / (1.0 - rate)

    ks = [k_ref[:, s, :].astype(jnp.float32) for s in range(t)]
    vs = [v_ref[:, s, :].astype(jnp.float32) for s in range(t)]
    qs = [q_ref[:, s, :].astype(jnp.float32) for s in range(t)]
    dk_acc = [None] * t
    dv_acc = [None] * t
    for tq in range(t):
        qt = qs[tq]
        scores = [
            jnp.dot(qt * ks[s], seg, preferred_element_type=jnp.float32) * scale
            for s in range(tq + 1)
        ]
        mx = scores[0]
        for s_val in scores[1:]:
            mx = jnp.maximum(mx, s_val)
        exps = [jnp.exp(s_val - mx) for s_val in scores]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        alphas = [e / denom for e in exps]  # pre-dropout softmax
        if rate > 0.0:
            keeps = [_dropout_mask(prng, a.shape, rate) for a in alphas]
            used = [
                jnp.where(kp, a * inv_keep, 0.0) for kp, a in zip(keeps, alphas)
            ]
        else:
            used = alphas

        gt = g_ref[:, tq, :].astype(jnp.float32)
        # d(alpha_used)[s] = (g . v_s) per head; dv_s += alpha_used[s] * g
        dused = []
        for s in range(tq + 1):
            dused.append(
                jnp.dot(gt * vs[s], seg, preferred_element_type=jnp.float32)
            )
            contrib = jnp.dot(used[s], seg_t, preferred_element_type=jnp.float32) * gt
            dv_acc[s] = contrib if dv_acc[s] is None else dv_acc[s] + contrib
        if rate > 0.0:
            dalpha = [
                jnp.where(kp, du * inv_keep, 0.0) for kp, du in zip(keeps, dused)
            ]
        else:
            dalpha = dused
        # softmax jacobian: ds[s] = alpha[s] * (dalpha[s] - sum_s' alpha[s']*dalpha[s'])
        dot = alphas[0] * dalpha[0]
        for s in range(1, tq + 1):
            dot = dot + alphas[s] * dalpha[s]
        dq_t = None
        for s in range(tq + 1):
            ds = alphas[s] * (dalpha[s] - dot)  # (BM, H)
            ds_b = jnp.dot(ds, seg_t, preferred_element_type=jnp.float32) * scale
            dq_term = ds_b * ks[s]
            dq_t = dq_term if dq_t is None else dq_t + dq_term
            dk_term = ds_b * qt
            dk_acc[s] = dk_term if dk_acc[s] is None else dk_acc[s] + dk_term
        dq_ref[:, tq, :] = dq_t.astype(dq_ref.dtype)

    zero = jnp.zeros((q_ref.shape[0], d), jnp.float32)
    for s in range(t):
        dk_ref[:, s, :] = (dk_acc[s] if dk_acc[s] is not None else zero).astype(
            dk_ref.dtype
        )
        dv_ref[:, s, :] = (dv_acc[s] if dv_acc[s] is not None else zero).astype(
            dv_ref.dtype
        )


def _pad_rows(x: jnp.ndarray, bm: int) -> jnp.ndarray:
    m = x.shape[0]
    pad = (-m) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    return x


def _block_rows(m: int) -> int:
    """Row-block size: _BLOCK_M for large inputs, else m rounded up to the bf16
    sublane multiple (16) so one block covers everything."""
    if m >= _BLOCK_M:
        return _BLOCK_M
    return max(16, ((m + 15) // 16) * 16)


def _call_fwd(q, k, v, seed, heads, rate, interpret):
    m, t, d = q.shape
    bm = _block_rows(m)
    qp, kp, vp = (_pad_rows(x, bm) for x in (q, k, v))
    grid = (qp.shape[0] // bm,)
    scale = 1.0 / ((d // heads) ** 0.5)
    spec = pl.BlockSpec((bm, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, t=t, heads=heads, scale=scale, rate=rate,
            interpret=interpret,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, qp, kp, vp)
    return out[:m]


def _call_bwd(q, k, v, g, seed, heads, rate, interpret):
    m, t, d = q.shape
    bm = _block_rows(m)
    qp, kp, vp, gp = (_pad_rows(x, bm) for x in (q, k, v, g))
    grid = (qp.shape[0] // bm,)
    scale = 1.0 / ((d // heads) ** 0.5)
    spec = pl.BlockSpec((bm, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(qp.shape, q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, t=t, heads=heads, scale=scale, rate=rate,
            interpret=interpret,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, qp, kp, vp, gp)
    return dq[:m], dk[:m], dv[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 6))
def _fused(q, k, v, heads, rate, seed, interpret):
    return _call_fwd(q, k, v, seed, heads, rate, interpret)


def _fused_fwd(q, k, v, heads, rate, seed, interpret):
    return _call_fwd(q, k, v, seed, heads, rate, interpret), (q, k, v, seed)


def _fused_bwd(heads, rate, interpret, res, g):
    q, k, v, seed = res
    dq, dk, dv = _call_bwd(q, k, v, g, seed, heads, rate, interpret)
    return dq, dk, dv, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_short_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    dropout_rate: float = 0.0,
    dropout_seed: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal softmax attention over (M, T, D) with head-major packed D = H*Dh.

    dropout_rate > 0 applies attention dropout (post-softmax, scaled by
    1/(1-rate)) using the TPU core PRNG seeded with `dropout_seed` (an int32
    scalar array); the backward regenerates the identical mask. In interpret
    mode the PRNG is emulated with a seeded counter-hash (see _Prng) — same
    determinism/draw-order contract, different bit values than real TPU runs.
    """
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    else:
        dropout_seed = dropout_seed.reshape((1,)).astype(jnp.int32)
    return _fused(q, k, v, heads, float(dropout_rate), dropout_seed, interpret)

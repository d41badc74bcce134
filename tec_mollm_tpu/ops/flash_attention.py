"""Fused causal attention: Pallas TPU kernel + XLA reference implementation.

STATUS: test/reference infrastructure, not a shipped fast path. No TEC-MoLLM
config can reach it: patching compresses the sequence to 3 tokens (21 in the
336 config — SURVEY.md §5 "Long-context"), and the measured v5e A/B at the
first reachable long-sequence sizes shows the kernel is NEUTRAL vs XLA's own
attention (scripts/bench_flash_attention.py, B=8 H=12 D=64, interleaved
min-of-5, round 2):

    T=128  fwd 0.88x   fwd+bwd 1.22x
    T=256  fwd 1.03x   fwd+bwd 0.83x
    T=512  fwd 0.77x   fwd+bwd 0.63x
    T=1024 fwd 1.05x   fwd+bwd 1.02x   (speedup = xla_ms / pallas_ms)

XLA fuses this attention well at these shapes, so `use_flash` stays opt-in and
OFF everywhere; the kernel remains as a correctness-tested Pallas pattern for a
future genuinely-long-context variant. Short sequences (T <= 4) use the
unrolled lane-friendly path in models/gpt2.py instead (measured +49% step).

Kernel design (one TPU core, VMEM-resident K/V):
  * grid = (B*H, num_q_blocks); each program handles one (batch*head, q-block);
  * K/V for the whole sequence of that batch*head stay in VMEM (T <= ~4k at
    D=64/128 fits comfortably in the ~16 MB budget);
  * scores (BQ, T) are computed on the MXU, causally masked with broadcasted iota,
    softmaxed in fp32, and contracted with V — no (B, H, T, T) tensor ever touches
    HBM;
  * backward: custom_vjp recomputes probabilities via the XLA reference (remat-style
    bwd — standard for inference-heavy fused kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLASH_MIN_SEQ = 128
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def reference_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool = True
) -> jnp.ndarray:
    """XLA einsum attention; the numerical golden for the Pallas kernel.
    q, k, v: (B, T, H, D)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
        head_dim**0.5, dtype=q.dtype
    )
    if causal:
        t = q.shape[1]
        mask = jnp.tril(jnp.ones((t, t), dtype=bool))
        scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, bq: int, t_valid: int
):
    """One (batch*head, q-block) program. Refs carry a leading block dim of 1:
    q_ref (1, BQ, D); k_ref/v_ref (1, T, D). Keys at index >= t_valid are padding
    and masked out unconditionally — with causal=False they would otherwise score
    0 (not -inf) and absorb softmax mass (ADVICE r1)."""
    iq = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, T)
    t = k.shape[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    key_mask = k_idx < t_valid
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0) + iq * bq
        key_mask = key_mask & (q_idx >= k_idx)
    scores = jnp.where(key_mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool, interpret: bool
) -> jnp.ndarray:
    b, t, h, d = q.shape
    scale = 1.0 / (d**0.5)
    bq = min(256, t)
    t_valid = t
    if t % bq:
        # pad T to a block multiple; padded queries are discarded below, padded
        # keys are masked inside the kernel via t_valid (causal or not)
        pad = bq - t % bq
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        t = q.shape[1]

    # (B, T, H, D) -> (B*H, T, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    grid = (b * h, t // bq)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, causal=causal, bq=bq, t_valid=t_valid
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), lambda ib, iq: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), lambda ib, iq: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qb, kb, vb)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)[:, :t_valid]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, causal: bool, interpret: bool):
    return _flash_forward(q, k, v, causal, interpret)


def _flash_fwd(q, k, v, causal, interpret):
    return _flash_forward(q, k, v, causal, interpret), (q, k, v)


def _flash_bwd(causal, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: reference_attention(a, b, c, causal), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    interpret: bool = False,
    min_seq: int = FLASH_MIN_SEQ,
) -> jnp.ndarray:
    """Fused attention. q, k, v: (B, T, H, D). Routes to the Pallas kernel on TPU
    for T >= min_seq; XLA reference otherwise (3-21-token default configs, CPU)."""
    t = q.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    if t >= min_seq and (on_tpu or interpret):
        return _flash_attention(q, k, v, causal, interpret)
    return reference_attention(q, k, v, causal=causal)


def flash_attention_interpret(q, k, v, causal: bool = True) -> jnp.ndarray:
    """Interpreter-mode entry for CPU tests of the kernel body."""
    with pltpu.force_tpu_interpret_mode():
        return _flash_attention(q, k, v, causal, True)

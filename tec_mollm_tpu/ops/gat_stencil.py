"""Pallas TPU kernel for stencil graph attention — OPT-IN ABLATION ARM.

Status (measured, BASELINE.md rounds 1-4): at every shipped config this kernel
is neutral-to-slower than the XLA stencil in models/gat.py — XLA already
pipelines the per-offset elementwise work against the surrounding matmuls, so
the fusion buys nothing at these shapes. It is kept as a tested ablation arm
(`gat_pallas=True`), not a recommended path.

LIMITS: forward-only — there is NO custom VJP (jnp.roll has no autodiff rule
inside pallas_call), so models/gat.py guards it to `deterministic` evaluation;
a training step never selects it (the guard enforces that, including the
gat_dropout=0 case).

What it fuses, for the record: the O (~11) neighbor shifts, leaky-relu scoring,
masked softmax over offsets, and the weighted neighbor sum in VMEM, so HBM sees
exactly one read of the projected features and one write of the output
(the XLA path materializes per-offset score/weight arrays between fusions).

Shapes: one program per graph slice m in [0, M = B*L):
    xl, xr: (M, H*C, N)   projected features, node axis in lanes
    valid:  (O, N)        per-offset neighbor validity
    out:    (M, H*C, N)

The XLA stencil in GATv2Stencil is the numerical golden (tests run this kernel
in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min)

# Mosaic's default scoped-VMEM stack is 16 MB; the denser long-horizon graph
# (300 km radius -> ~33 offsets vs 11) overflows it because the per-offset fp32
# temporaries scale with O. v5e has 128 MB of physical VMEM — raise the cap.
_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel(
    xl_ref, xr_ref, valid_ref, att_ref, out_ref, *, shifts, heads, c, slope
):
    """xl_ref/xr_ref: (1, H*C, N); valid_ref: (O, N) float 0/1; att_ref: (H, C)."""
    n = xl_ref.shape[-1]
    xl = xl_ref[0].astype(jnp.float32).reshape(heads, c, n)
    xr = xr_ref[0].astype(jnp.float32).reshape(heads, c, n)
    att = att_ref[:].astype(jnp.float32)  # (H, C)

    def rolled(o: int) -> jnp.ndarray:
        # want rolled[n] = xl[n + shift]; roll by (-shift) mod n along lanes
        sh = (-shifts[o]) % n
        return pltpu.roll(xl, sh, axis=2) if sh else xl

    num_o = len(shifts)
    scores = []
    for o in range(num_o):
        e = rolled(o) + xr
        e = jnp.where(e >= 0, e, slope * e)  # leaky_relu
        s = jnp.sum(e * att[:, :, None], axis=1)  # (H, N)
        v = valid_ref[o, :][None, :] > 0.5  # (1, N)
        scores.append(jnp.where(v, s, _NEG))

    m = scores[0]
    for s in scores[1:]:
        m = jnp.maximum(m, s)
    weights = []
    denom = jnp.zeros_like(m)
    for o in range(num_o):
        v = valid_ref[o, :][None, :] > 0.5
        w = jnp.where(v, jnp.exp(scores[o] - m), 0.0)
        weights.append(w)
        denom = denom + w

    acc = jnp.zeros((heads, c, n), jnp.float32)
    for o in range(num_o):
        alpha = weights[o] / denom  # (H, N)
        acc = acc + alpha[:, None, :] * rolled(o)

    out_ref[0] = acc.reshape(heads * c, n).astype(out_ref.dtype)


def gat_stencil_attention(
    xl: jnp.ndarray,       # (M, H*C, N)
    xr: jnp.ndarray,       # (M, H*C, N)
    valid: jnp.ndarray,    # (O, N) bool or 0/1
    att: jnp.ndarray,      # (H, C)
    shifts: tuple[int, ...],
    negative_slope: float = 0.2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward attention. Returns (M, H*C, N) in xl's dtype."""
    m_dim, hc, n = xl.shape
    heads, c = att.shape
    assert heads * c == hc
    valid = valid.astype(jnp.float32)
    kernel = functools.partial(
        _kernel, shifts=tuple(shifts), heads=heads, c=c, slope=float(negative_slope)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_dim, hc, n), xl.dtype),
        grid_spec=pl.GridSpec(
            grid=(m_dim,),
            in_specs=[
                pl.BlockSpec((1, hc, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((valid.shape[0], n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((heads, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, hc, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xl, xr, valid, att)

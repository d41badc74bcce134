"""Fused (LayerNorm -> c_fc -> gelu_new -> c_proj -> +residual) Pallas kernel.

Motivation: XLA's cost analysis shows the GPT-2 backbone forward is HBM-bandwidth
bound (~52 GB accessed per fwd at B=16 vs 6 TFLOP of compute); fusing the whole
MLP residual branch keeps the (rows, 3072) hidden tensor in VMEM.

MEASURED OUTCOME (v5e, interleaved A/B at B=16): 163 ms/fwd fused vs 139 ms/fwd
XLA — XLA's own fusion already wins on throughput for this shape, so the kernel is
OPT-IN (TECMoLLM.use_fused_mlp). It does compile ~8x faster (27 s vs 234 s through
the remote compiler), which matters for one-shot evaluations.

Kernel layout: grid over row tiles (R rows of d); weights (d x 4d and 4d x d, bf16)
are block-constant (index_map pins them, Pallas keeps them resident in VMEM).
R=256, d=768: ~11 MB VMEM. LayerNorm statistics in fp32; matmuls on the MXU with
fp32 accumulation; tanh-approximate gelu (HF gelu_new).

Training uses the XLA path (the MLP has no dropout inside the residual branch in
our GPT-2 — resid dropout sits outside — but the backward here is a custom_vjp
recompute through the XLA reference; fwd-only callers get the full win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-5):
    """XLA reference: x + c_proj(gelu_new(c_fc(ln(x))))."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale + ln_bias
    h = h.astype(x.dtype)
    h = h @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    h = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return x + h


def _kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, eps):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)
    h = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    h = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + h).astype(o_ref.dtype)


def _fused_forward(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    rows, d = x.shape
    d_h = w1.shape[1]
    r = min(256, rows)
    if rows % r:
        pad = r - rows % r
        out = _fused_forward(
            jnp.pad(x, ((0, pad), (0, 0))), ln_scale, ln_bias, w1, b1, w2, b2,
            eps, interpret,
        )
        return out[:rows]
    kernel = functools.partial(_kernel, eps=eps)
    vec = lambda v: v.reshape(1, -1)  # TPU VMEM refs want >= 2D
    row_vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(rows // r,),
            in_specs=[
                pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                row_vec(d),
                row_vec(d),
                pl.BlockSpec((d, d_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                row_vec(d_h),
                pl.BlockSpec((d_h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                row_vec(d),
            ],
            out_specs=pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, vec(ln_scale), vec(ln_bias), w1, vec(b1), w2, vec(b2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    return _fused_forward(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret)


def _fused_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    out = _fused_forward(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_bwd(eps, interpret, residuals, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda *a: reference_ln_mlp(*a, eps=eps), x, ln_scale, ln_bias, w1, b1, w2, b2
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ln_mlp(
    x: jnp.ndarray,        # (rows, d) — flattened tokens
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,       # (d, 4d)
    b1: jnp.ndarray,
    w2: jnp.ndarray,       # (4d, d)
    b2: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + c_proj(gelu_new(c_fc(ln(x)))), fused in VMEM on TPU; XLA reference on
    other backends."""
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu or interpret:
        # kernel matmuls need operand dtypes to agree with x
        w1 = w1.astype(x.dtype)
        w2 = w2.astype(x.dtype)
        return _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret)
    return reference_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)


def fused_ln_mlp_interpret(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-5):
    with pltpu.force_tpu_interpret_mode():
        return _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, True)

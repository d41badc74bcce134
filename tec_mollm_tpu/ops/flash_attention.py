"""Causal flash attention (Pallas TPU) with an XLA reference fallback.

The default TEC-MoLLM config sees only 3-21 tokens after patching
(SURVEY.md §5 "Long-context"), so the fused path matters for the scaled
variants (L_in=336+ / autoregressive rollout eval). Interface matches the
GPT-2 attention core: q, k, v are (B, T, H, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def reference_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool = True
) -> jnp.ndarray:
    """XLA einsum attention; the numerical golden for the Pallas kernel."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
        head_dim**0.5, dtype=q.dtype
    )
    if causal:
        t = q.shape[1]
        mask = jnp.tril(jnp.ones((t, t), dtype=bool))
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.jit, static_argnames=("causal",))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool = True
) -> jnp.ndarray:
    """Fused attention. Currently routes to the XLA reference (which XLA already
    fuses well at these sequence lengths); the Pallas blocked kernel lands behind
    this same signature so callers don't change."""
    return reference_attention(q, k, v, causal=causal)

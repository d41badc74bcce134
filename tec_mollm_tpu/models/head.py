"""Prediction head: flatten LLM tokens -> 2-layer MLP -> horizon forecasts.

Behavioral contract (reference /root/reference/src/model/modules.py:268-313):
input (B, P, d_llm) flattened to (B, P*d_llm); Linear(in -> in // hidden_ratio),
exact GELU, Dropout(0.1), Linear(-> L_out).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tec_mollm_tpu.config import ModelConfig


class PredictionHead(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, P, d_llm) -> (B, L_out * num_outputs).

        num_outputs is 1 (reference point forecast) or len(cfg.quantiles)
        (beyond-reference probabilistic head)."""
        cfg = self.cfg
        x = x.reshape(x.shape[0], -1)
        hidden = cfg.head_input_dim // cfg.head_hidden_ratio
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=cfg.head_dropout, deterministic=deterministic)(x)
        return nn.Dense(
            cfg.prediction_horizon * cfg.num_outputs, dtype=self.dtype, name="fc2"
        )(x)

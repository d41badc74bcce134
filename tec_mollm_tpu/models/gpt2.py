"""Truncated GPT-2 backbone with LoRA-adapted attention, rebuilt in Flax.

Behavioral contract (reference /root/reference/src/model/modules.py:156-209):
  * pre-trained GPT-2, truncated to the first `llm_layers` transformer blocks
    (modules.py:170);
  * LoRA(r=32, alpha=64) on c_attn only (modules.py:177-183);
  * inputs_embeds path (no token embedding / wte in the compute graph) + wpe
    positional embeddings, all-ones attention mask (modules.py:205-209,
    tec_mollm.py:111-112);
  * trainable parameters: lora_*, ln_*, wpe (modules.py:195-203) — enforced by the
    optimizer mask, not here;
  * HF GPT-2 specifics matched exactly for weight-import parity: LayerNorm eps 1e-5,
    gelu_new (tanh approximation) in the MLP, attention scale 1/sqrt(head_dim),
    causal masking, embd/attn/resid dropout 0.1.

TPU-first notes: the sequence is tiny (3 tokens by default; 21 in the 336-config),
so attention here is an ordinary batched einsum that XLA fuses — the Pallas flash
attention in ops/flash_attention.py is plugged in automatically for long-sequence
variants via `use_flash`. The heavy axis is batch (B*N ≈ 5822*B sequences), which is
exactly what the MXU wants. `remat` wraps each block with jax.checkpoint, replacing
the reference's per-step gradient_checkpointing_enable (train.py:70-73).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import ModelConfig
from tec_mollm_tpu.models.lora import LoRADense


class GPT2Attention(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        b, t, d = x.shape
        head_dim = d // cfg.llm_heads

        qkv = LoRADense(
            features=3 * d,
            rank=cfg.lora_r,
            alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout,
            dtype=self.dtype,
            name="c_attn",
        )(x, deterministic=deterministic)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.llm_heads, head_dim)
        k = k.reshape(b, t, cfg.llm_heads, head_dim)
        v = v.reshape(b, t, cfg.llm_heads, head_dim)

        if self.use_flash and t > 1:
            from tec_mollm_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, causal=True)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
                head_dim**0.5, dtype=x.dtype
            )
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            scores = jnp.where(causal, scores, jnp.finfo(jnp.float32).min)
            probs = nn.softmax(scores, axis=-1)
            probs = nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        out = out.reshape(b, t, d)
        out = LoRADense(features=d, rank=0, dtype=self.dtype, name="c_proj")(out)
        return nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(out)


class GPT2MLP(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        h = LoRADense(features=self.cfg.llm_mlp_ratio * d, rank=0, dtype=self.dtype, name="c_fc")(x)
        # HF GPT-2 activation is gelu_new == tanh-approximate gelu
        h = nn.gelu(h, approximate=True)
        h = LoRADense(features=d, rank=0, dtype=self.dtype, name="c_proj")(h)
        return nn.Dropout(rate=self.cfg.llm_dropout, deterministic=deterministic)(h)


class GPT2Block(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        ln = partial(nn.LayerNorm, epsilon=1e-5, dtype=self.dtype)
        h = ln(name="ln_1")(x)
        x = x + GPT2Attention(self.cfg, dtype=self.dtype, use_flash=self.use_flash, name="attn")(
            h, deterministic=deterministic
        )
        h = ln(name="ln_2")(x)
        x = x + GPT2MLP(self.cfg, dtype=self.dtype, name="mlp")(h, deterministic=deterministic)
        return x


class GPT2Backbone(nn.Module):
    """inputs_embeds (B, T, d_llm) -> last_hidden_state (B, T, d_llm)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, inputs_embeds: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        t = inputs_embeds.shape[1]
        wpe = self.param(
            "wpe",
            nn.initializers.normal(stddev=0.01),  # HF initializes wpe with std 0.01
            (cfg.llm_max_positions, cfg.d_llm),
        )
        x = inputs_embeds.astype(self.dtype) + wpe[:t].astype(self.dtype)[None]
        x = nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(x)

        block_cls = GPT2Block
        if self.remat:
            block_cls = nn.remat(GPT2Block, static_argnums=(2,))
        for i in range(cfg.llm_layers):
            x = block_cls(cfg, dtype=self.dtype, use_flash=self.use_flash, name=f"h_{i}")(
                x, deterministic
            )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)

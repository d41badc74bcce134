"""Byte-level language model over the GPT-2 backbone, for in-environment
surrogate pretraining.

Why this exists (VERDICT r2 missing #1): the reference's core premise is a
*pretrained* GPT-2 backbone (`AutoModel.from_pretrained('gpt2')`,
/root/reference/src/model/modules.py:165-170). This environment has no network
egress and no cached HF weights, so real GPT-2 weights are unobtainable here
(recorded in BASELINE.md). The closest in-env substitute is to PRETRAIN the
same 3-block/768-wide backbone as a byte-level LM on locally available text
(the Time-LLM-style premise: language-pretrained transformer features transfer
to time-series tokens), export it in HF GPT-2 checkpoint format, and feed it
through the exact `train.py --gpt2-checkpoint` / models/hf_import.py path a
real GPT-2 checkpoint would take.

The LM is wte(256 bytes) + GPT2Backbone + tied readout (logits = h @ wte^T,
GPT-2's weight tying). The backbone config uses lora_r=0 (plain projections)
so the exported checkpoint is a vanilla GPT-2 state dict; downstream LoRA
adapters are freshly initialized by hf_import.merge_gpt2_params, exactly as
with real HF weights.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tec_mollm_tpu.config import ModelConfig


def pretrain_model_config(base: ModelConfig | None = None) -> ModelConfig:
    """Backbone config for pretraining: identical transformer shape to the
    downstream model, but without LoRA (lora_r=0) so the exported checkpoint is
    a plain GPT-2 state dict."""
    base = base or ModelConfig()
    return dataclasses.replace(base, lora_r=0, lora_alpha=0.0, lora_dropout=0.0)


class ByteLM(nn.Module):
    """256-way byte LM: wte + GPT2Backbone + tied logits."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    vocab: int = 256

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, T) int32 -> logits (B, T, vocab)."""
        from tec_mollm_tpu.models.gpt2 import GPT2Backbone

        wte = self.param(
            "wte", nn.initializers.normal(stddev=0.02), (self.vocab, self.cfg.d_llm)
        )
        x = wte[tokens].astype(self.dtype)
        h = GPT2Backbone(self.cfg, dtype=self.dtype, name="backbone")(
            x, deterministic=deterministic
        )
        # tied readout in fp32 (logit precision matters for the loss)
        return h.astype(jnp.float32) @ wte.T.astype(jnp.float32)


def next_byte_loss(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy of predicting token t+1 from positions <= t (nats)."""
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


# ---------------------------------------------------------------------------
# corpus assembly + batching (host side)
# ---------------------------------------------------------------------------


def gather_text_corpus(
    roots: list[str],
    extensions: tuple[str, ...] = (".py", ".md", ".txt", ".rst"),
    max_bytes: int = 64 * 1024 * 1024,
    max_file_bytes: int = 512 * 1024,
) -> bytes:
    """Concatenate local text files under `roots` into one byte corpus
    (deterministic order). This environment has no downloadable text; source
    trees are the largest body of natural-ish language available."""
    import os

    chunks: list[bytes] = []
    total = 0
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            if "__pycache__" in dirpath or "/." in dirpath:
                continue
            for name in sorted(filenames):
                if not name.endswith(extensions):
                    continue
                path = os.path.join(dirpath, name)
                try:
                    with open(path, "rb") as f:
                        data = f.read(max_file_bytes)
                except OSError:
                    continue
                chunks.append(data)
                total += len(data)
                if total >= max_bytes:
                    return b"\n".join(chunks)[:max_bytes]
    return b"\n".join(chunks)


def byte_batches(
    corpus: bytes,
    batch_size: int,
    seq_len: int,
    seed: int = 0,
    val_fraction: float = 0.02,
) -> tuple[Iterator[np.ndarray], np.ndarray]:
    """Infinite iterator of (B, T) uint8->int32 training batches sampled at
    random offsets, plus one fixed validation batch from a held-out tail."""
    arr = np.frombuffer(corpus, dtype=np.uint8)
    # the val slice must itself hold at least one full window (batch_size=1
    # would otherwise leave len(val) == seq_len+1 and a degenerate rng range)
    n_val = max(
        int(len(arr) * val_fraction), batch_size * (seq_len + 1), seq_len + 2
    )
    # the train remainder must leave room for at least one full window, or the
    # offset draw below degenerates into an opaque rng error
    min_bytes = n_val + seq_len + 2
    if len(arr) < min_bytes:
        raise ValueError(
            f"corpus of {len(arr)} bytes is too small for batch_size="
            f"{batch_size} x seq_len={seq_len}: need >= {min_bytes} bytes "
            "(shrink the batch/sequence or point --corpus-roots at more text)"
        )
    train, val = arr[:-n_val], arr[-n_val:]
    rng = np.random.default_rng(seed)

    v_off = rng.integers(0, len(val) - seq_len - 1, size=batch_size)
    val_batch = np.stack(
        [val[o : o + seq_len + 1] for o in v_off]
    ).astype(np.int32)

    def it() -> Iterator[np.ndarray]:
        while True:
            offs = rng.integers(0, len(train) - seq_len - 1, size=batch_size)
            yield np.stack(
                [train[o : o + seq_len + 1] for o in offs]
            ).astype(np.int32)

    return it(), val_batch

"""Spatio-temporal embedding tables.

Behavioral contract (reference /root/reference/src/model/modules.py:211-266):
five learnable tables of dim d_emb — node(num_nodes), tod(12), doy(366),
year(num_years), season(4); temporal = tod + doy + year + season;
combined = node + temporal; output = concat([x, combined], -1).

TPU-first difference: time features arrive as (B, L, 4) and the combined embedding is
broadcast over nodes on device, instead of the reference's host-side expand of
time_features to (B, L, N, 4) (train.py:58-65) followed by per-node lookups.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tec_mollm_tpu.config import ModelConfig


class SpatioTemporalEmbedding(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_features: jnp.ndarray) -> jnp.ndarray:
        """x: (B, L, N, C_in) float; time_features: (B, L, 4) int
        -> (B, L, N, C_in + d_emb)."""
        cfg = self.cfg
        # torch nn.Embedding default init is N(0, 1) (reference modules.py:219-226)
        init = nn.initializers.normal(stddev=1.0)

        def table(name: str, vocab: int) -> nn.Embed:
            # DELIBERATE deviation (like the GATv2 batching fix, SURVEY §2.d.1):
            # the year table is the only one evaluated OUTSIDE its training
            # support — with archive-anchored year indexing (data/features.py),
            # train years 2013-21 touch rows 0-8 while the reference's own
            # val/test split (2022+) reads rows 9-12, which under the
            # reference's N(0,1) init stay pure noise forever (norm ~4, same
            # as trained rows — measured on a 9-year-trained checkpoint).
            # Zero init makes an unseen year read the exact "no year
            # information" vector — which AdamW's weight decay also makes the
            # shrinkage target — while trained rows learn exactly as before.
            # tod/doy/season/node are always fully covered by training, so
            # they keep the reference's init.
            emb_init = nn.initializers.zeros if name == "year" else init
            return nn.Embed(
                vocab, cfg.d_emb, embedding_init=emb_init, dtype=self.dtype, name=name
            )

        node_emb = table("node", cfg.num_nodes)(
            jnp.arange(cfg.num_nodes, dtype=jnp.int32)
        )  # (N, d)
        tf = time_features.astype(jnp.int32)
        temporal = (
            table("tod", cfg.num_tod)(tf[..., 0])
            + table("doy", cfg.num_doy)(tf[..., 1])
            + table("year", cfg.num_years)(tf[..., 2])
            + table("season", cfg.num_seasons)(tf[..., 3])
        )  # (B, L, d)
        combined = node_emb[None, None, :, :] + temporal[:, :, None, :]  # (B, L, N, d)
        return jnp.concatenate([x.astype(self.dtype), combined], axis=-1)

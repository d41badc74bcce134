"""TEC-MoLLM: full model assembly.

Behavioral contract (reference /root/reference/src/model/tec_mollm.py:15-125), shape
ledger for B=batch, L=48, N=2911 (SURVEY.md §2.c):

    x (B,L,N,6) --embed--> (B,L,N,22) --GATv2+residual per (B,L)--> (B,L,N,22)
      --> (B*N, L, 22) --multi-scale conv--> (B*N, 12, 128) --patch--> (B*N, 3, 768)
      --GPT-2 (3 blocks, LoRA)--> (B*N, 3, 768) --dropout 0.1--> head --> (B*N, 12)
      --> (B, L_out, N, 1)

The reference's permute/reshape choreography (tec_mollm.py:84-106) collapses into two
transposes here; the GNN runs directly on the (B, L, N, C) layout (the neighbor table
broadcasts over leading axes) instead of flattening to (L*B, N, C).

edge_weight is not part of the API: GATv2 ignores it in the reference
(modules.py:355-356) and test.py omits it, which crashes the reference's positional
signature (SURVEY.md §2.d.2) — here the graph is passed as a padded neighbor table.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tec_mollm_tpu.config import ModelConfig
from tec_mollm_tpu.graph.builder import GraphData
from tec_mollm_tpu.models.embeddings import SpatioTemporalEmbedding
from tec_mollm_tpu.models.gat import SpatialEncoder
from tec_mollm_tpu.models.gpt2 import UNROLL_MAX_SEQ, GPT2Backbone
from tec_mollm_tpu.models.head import PredictionHead
from tec_mollm_tpu.models.temporal import TemporalEncoder


def graph_inputs(
    graph: GraphData, use_stencil: bool = True
) -> tuple[tuple[int, ...] | None, tuple[jnp.ndarray, jnp.ndarray]]:
    """Pick the fastest available graph representation for TECMoLLM.

    Returns (stencil_shifts, (neighbors_arg, mask_arg)): stencil (lane-shift)
    mode on regular grids, padded-gather otherwise. Parameters are identical
    between modes, so checkpoints are interchangeable."""
    if use_stencil and graph.has_stencil:
        shifts = tuple(int(s) for s in graph.stencil_shifts)
        valid = jnp.asarray(graph.stencil_valid)
        return shifts, (valid, valid)
    return None, (jnp.asarray(graph.neighbors), jnp.asarray(graph.neighbor_mask))


class TECMoLLM(nn.Module):
    """When `stencil_shifts` is set (regular-grid graphs — the default for the
    41x71 TEC grid), pass GraphData.stencil_valid (O, N) as `neighbors`; the
    padded table is not needed (see gat.SpatialEncoder)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    remat_llm: bool = False
    # named jax.checkpoint policy for the remat'd blocks (gpt2.REMAT_POLICIES):
    # None/'full' recomputes everything; 'dots_saveable' keeps MXU outputs and
    # recomputes only the elementwise chain
    remat_policy: str | None = None
    use_flash: bool = False
    # one-pass Pallas short-T attention (ops/short_attention.py): q/k/v read from
    # HBM once per layer, custom-VJP backward; TPU-only, short-T-only guard in
    # GPT2Attention. Measured SLOWER than the XLA unrolled path on v5e (train
    # 143.5 vs 120.5 ms, eval 105.6 vs 96.8 ms interleaved) — XLA's pipelined
    # fusions win at these shapes — so it stays opt-in. With dropout it uses its
    # own seeded PRNG stream.
    fused_attn: bool = False
    # threshold for the statically-unrolled lane-friendly attention (see
    # gpt2.UNROLL_MAX_SEQ): T=6 long-horizon measured +50% unrolled vs einsum
    unroll_max_seq: int = UNROLL_MAX_SEQ
    stencil_shifts: tuple[int, ...] | None = None
    # branch-fused temporal convs measured neutral-to-slightly-slower on v5e
    # (189 vs 185 ms/step interleaved A/B); XLA already fuses the three branches
    fuse_conv: bool = False
    # lean conv-block epilogue: GroupNorm stats on the full sequence but
    # normalize+GELU only at the positions the strided 1x1 conv reads, and the
    # 3-branch concat replaced by summed partial matmuls (see temporal._lean).
    # Measured SLOWER on v5e (124.3 vs 120.5 ms/step interleaved): three small
    # per-branch matmuls lose to one fat concat matmul, and the backward touches
    # the full length through the GN stats regardless — stays off.
    lean_gn: bool = False
    # fused ln_2+MLP+residual Pallas kernel for deterministic (eval) calls on TPU
    # (ops/fused_mlp.py). Measured SLOWER than XLA's own fusion on v5e (163 vs
    # 139 ms/fwd at B=16, interleaved A/B) — XLA fuses this branch well — so it
    # stays opt-in; it also compiles 8x faster, useful for one-shot evals.
    use_fused_mlp: bool = False
    # fused stencil-GAT Pallas kernel on the deterministic path (ops/gat_stencil.py):
    # measured ~2.5% faster eval fwd and 4x faster compile than the XLA stencil on
    # v5e; training and CPU route to the XLA stencil automatically
    gat_pallas: bool = True
    # single-pass fp32-stat LayerNorm without materialized fp32 activations; the
    # two-pass form measured ~18 ms/step across 7 LNs (trace r2). Interleaved TPU
    # A/B: 120.2 vs 121.6 ms/step (+1.1%), parity-tested vs nn.LayerNorm
    # (tests/test_gpt2_golden.py) — on by default.
    lean_ln: bool = True
    # Round the node axis up to a multiple of this after the embedding
    # (2911 -> 2944 = 23x128 at the default grid) so the lane-major
    # stencil-GAT stages and the B*N-batched matmul stages tile without a
    # ragged 128-lane tail. Padded nodes carry zero features, all-False
    # stencil validity (so no real node attends to them), and are sliced off
    # before the output; node axes smaller than one multiple are left alone
    # (tiny test grids would otherwise 2-3x their compute). Interleaved v5e
    # A/B at the flagship config (round 4): train 118.2 vs 119.9 ms (+1.5%),
    # eval forward 86.4 vs 96.3 ms at B=16 (+11.4%) — DEFAULT ON. 0 = off.
    pad_nodes_to: int = 128
    # Roofline shape experiment: express each conv block's three branches as
    # ONE explicit im2col gather + a single fat (kmax*C_in, 3*C_out) matmul
    # with per-branch zero-padded taps, instead of conv_general_dilated ops —
    # same parameters/math as fuse_conv, different lowering (plain MXU GEMM
    # vs XLA's conv algorithm). See temporal.MultiScaleConvBlock.
    im2col_conv: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,              # (B, L, N, C_in) float
        time_features: jnp.ndarray,  # (B, L, 4) int
        neighbors: jnp.ndarray,      # (N, D) int32 table, or (O, N) stencil validity
        neighbor_mask: jnp.ndarray,  # (N, D) bool (ignored in stencil mode)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, l, n, _ = x.shape

        # 0. (opt-in) RevIN: normalize the TEC channel per (window, node) so the
        # network sees level-free inputs; predictions are mapped back below. At
        # init (near-zero head output) the model therefore predicts the window
        # mean — the Historical-Average baseline — and learns deviations from it.
        if cfg.revin:
            x0 = x[..., 0]
            mu = jnp.mean(x0, axis=1, keepdims=True)                    # (B,1,N)
            sd = jnp.sqrt(jnp.var(x0, axis=1, keepdims=True) + 1e-5)   # (B,1,N)
            x = jnp.concatenate(
                [((x0 - mu) / sd)[..., None], x[..., 1:]], axis=-1
            )

        # 1. spatio-temporal embedding: (B, L, N, 6) -> (B, L, N, 22)
        h = SpatioTemporalEmbedding(cfg, dtype=self.dtype, name="embedding")(
            x, time_features
        )

        # 1b. (opt-in) lane padding of the node axis: zero features, no valid
        # neighbor edges, sliced off again before the output reshape — real
        # nodes' math is untouched (wrap/roll reads of the pad region were
        # already masked invalid on the unpadded grid)
        n_orig = n
        if self.pad_nodes_to and n >= self.pad_nodes_to:
            n_pad = (-n) % self.pad_nodes_to
            if n_pad:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
                if self.stencil_shifts is not None:
                    # stencil mode: neighbors is the (O, N) validity mask
                    neighbors = jnp.pad(neighbors, ((0, 0), (0, n_pad)))
                else:
                    neighbors = jnp.pad(neighbors, ((0, n_pad), (0, 0)))
                    neighbor_mask = jnp.pad(neighbor_mask, ((0, n_pad), (0, 0)))
                n += n_pad

        # 2-4. graph attention + residual, applied per (batch, timestep) slice
        h = SpatialEncoder(
            cfg,
            dtype=self.dtype,
            stencil_shifts=self.stencil_shifts,
            gat_pallas=self.gat_pallas,
            name="spatial",
        )(h, neighbors, neighbor_mask, deterministic=deterministic)

        # 5. to per-node sequences: (B, L, N, C) -> (B*N, L, C)
        c = h.shape[-1]
        h = h.transpose(0, 2, 1, 3).reshape(b * n, l, c)

        # 6. temporal encoder: (B*N, L, 22) -> (B*N, P, d_llm)
        h = TemporalEncoder(
            cfg,
            dtype=self.dtype,
            fuse_branches=self.fuse_conv,
            lean_gn=self.lean_gn,
            im2col=self.im2col_conv,
            name="temporal",
        )(h)

        # 7. LLM backbone (+ dropout 0.1, reference tec_mollm.py:115)
        h = GPT2Backbone(
            cfg,
            dtype=self.dtype,
            remat=self.remat_llm,
            remat_policy=self.remat_policy,
            use_flash=self.use_flash,
            use_fused_mlp=self.use_fused_mlp,
            lean_ln=self.lean_ln,
            fused_attn=self.fused_attn,
            unroll_max_seq=self.unroll_max_seq,
            name="llm",
        )(h, deterministic=deterministic)
        h = nn.Dropout(rate=cfg.post_llm_dropout, deterministic=deterministic)(h)

        # 8-10. head + final reshape: (B*N, L_out*Q) -> (B, L_out, N, Q)
        # (Q = 1 point forecast, or len(cfg.quantiles) probabilistic levels)
        preds = PredictionHead(cfg, dtype=self.dtype, name="head")(
            h, deterministic=deterministic
        )
        preds = preds.reshape(b, n, cfg.prediction_horizon, cfg.num_outputs)
        preds = preds.transpose(0, 2, 1, 3).astype(jnp.float32)
        if n != n_orig:
            preds = preds[:, :, :n_orig]
        if cfg.quantiles:
            # non-crossing guarantee: levels are monotone along the last axis
            # (sort is differentiable in JAX; pinball trains through it)
            preds = jnp.sort(preds, axis=-1)
        if cfg.revin:
            # invert the instance normalization: back to the global-scaler space
            # (sd > 0, so the quantile ordering survives the affine map)
            preds = preds * sd[..., None].astype(jnp.float32) + mu[..., None].astype(
                jnp.float32
            )
        return preds

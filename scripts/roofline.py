"""Analytic speed-of-light audit: per-stage roofline bounds vs measured times.

For every model stage this computes, from the Config alone (no device needed):

  * MXU FLOPs        — matmul/conv multiply-adds x2 (the work the systolic
                       array must issue no matter how XLA fuses);
  * HBM bytes floor  — each stage's inputs read once + outputs written once
                       at the compute dtype, plus the handful of intermediates
                       that provably cannot stay in VMEM (documented inline).
                       This is the perfect-fusion lower bound, not a traffic
                       model;
  * t_light          — max(FLOPs / MXU_PEAK, bytes / HBM_BW): the stage cannot
                       run faster than its binding resource.

Backward-pass multipliers encode the trainable/frozen partition
(training/train_state.py): frozen dense layers (the GPT-2 base kernels) need
only dX = dY @ W^T in the backward (their dW is dead code under
grad-wrt-trainable), so the backbone's train bound is 2x forward, while
trainable stages (embedding/GAT/convs/head/LoRA) pay the classic 3x.

Compare against measured stage times (scripts/profile_stages.py JSON lines)
with --measured:

    python scripts/profile_stages.py --batch-size 8 > /tmp/stages.jsonl
    python scripts/roofline.py --batch-size 8 --measured /tmp/stages.jsonl

Elementwise chains (softmax, GELU, LN/GN stats, leaky-relu) are counted in
the bytes floor but not given a VPU-issue bound; a stage measuring well above
its t_light with few MXU FLOPs is VPU-bound, not broken (the GAT stencil's
O(offsets) mask/exp chain is the known case — see DESIGN.md §20).

Chip constants default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM — the
public "How to Scale Your Model" numbers); override with --peak-tflops /
--hbm-gbps for other parts.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt_t(seconds: float) -> str:
    return f"{seconds * 1e3:8.3f}"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="default")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 MXU peak, TFLOP/s")
    p.add_argument("--hbm-gbps", type=float, default=819.0)
    p.add_argument("--measured", default=None,
                   help="profile_stages.py JSON-lines output to compare against")
    args = p.parse_args()

    from tec_mollm_tpu.config import PRESETS, tiny_config
    from tec_mollm_tpu.data.synthetic import grid_coordinates
    from tec_mollm_tpu.graph import build_graph

    presets = dict(PRESETS, tiny=tiny_config)
    cfg = presets[args.preset]()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size)
    )
    m = cfg.model
    B, L, N = args.batch_size, cfg.train.L_in, m.num_nodes
    DT = 2 if cfg.train.bf16 else 4  # compute-dtype bytes
    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9

    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph = build_graph(lat, lon, distance_threshold_km=cfg.data.distance_threshold_km)
    n_off = len(graph.stencil_shifts) if graph.has_stencil else int(graph.neighbors.shape[1])

    C = m.spatial_in_channels          # 22: C_in + d_emb
    HC = m.spatial_heads * m.spatial_out_channels  # == C (residual contract)
    stages: dict[str, dict] = {}

    def add(name, mxu_flops, bytes_floor, bwd_mult):
        stages[name] = {
            "mxu_flops": float(mxu_flops),
            "bytes": float(bytes_floor),
            "bwd_mult": bwd_mult,
        }

    # -- embedding: 4 tiny table gathers + broadcast add + concat with x.
    # FLOPs negligible; floor = read x + write (B,L,N,C) output.
    add("embedding",
        mxu_flops=0.0,
        bytes_floor=(B * L * N * m.in_features + B * L * N * C) * DT,
        bwd_mult=3.0)

    # -- spatial GAT (stencil form): two (C -> HC) projections are the MXU
    # work; the per-offset score/softmax/accumulate chain is VPU work counted
    # only in the bytes floor: xl/xr written once, xl re-read once per offset
    # per pass (2 passes), out written once.
    elems = B * L * N * C
    add("spatial_gat",
        mxu_flops=2 * 2 * B * L * N * C * HC,
        bytes_floor=(elems            # read x
                     + 2 * elems      # write xl, xr
                     + 2 * n_off * elems  # re-read shifted xl in both passes
                     + elems) * DT,   # write out
        bwd_mult=3.0)

    # -- temporal convs: per block, three SAME convs (k in kernel_sizes) over
    # L_i, then GN+GELU, then the strided 1x1 over the 3C concat.
    conv_flops = 0.0
    conv_bytes = 0.0
    L_i, C_in = L, C
    for C_out, stride in zip(m.temporal_channel_list, m.temporal_strides):
        ksum = sum(m.conv_kernel_sizes)
        nb = len(m.conv_kernel_sizes)
        conv_flops += 2 * B * N * L_i * C_in * C_out * ksum          # branch convs
        conv_flops += 2 * B * N * (L_i // stride) * nb * C_out * C_out  # 1x1 strided
        conv_bytes += (B * N * L_i * C_in                   # read in
                       + 2 * B * N * L_i * nb * C_out       # branch out + GN read
                       + B * N * (L_i // stride) * C_out) * DT  # block out
        L_i //= stride
        C_in = C_out
    # latent patching projection: (B*N, P, patch*C_last) @ (-> d_llm)
    patch_in = m.effective_patch_len * m.temporal_channel_list[-1]
    conv_flops += 2 * B * N * m.num_patches * patch_in * m.d_llm
    conv_bytes += (B * N * m.num_patches * (patch_in + m.d_llm)) * DT
    add("temporal_convs", conv_flops, conv_bytes, bwd_mult=3.0)

    # -- GPT-2 backbone: rows = B*N sequences x P tokens. Base kernels frozen
    # (bwd needs dX only -> 2x fwd); LoRA adds rank-r trainable matmuls (3x).
    rows = B * N * m.num_patches
    d = m.d_llm
    base = (2 * rows * d * 3 * d      # qkv
            + 2 * rows * d * d        # attn out proj
            + 2 * rows * d * m.llm_mlp_ratio * d * 2)  # mlp fc + proj
    lora = 2 * rows * d * m.lora_r + 2 * rows * m.lora_r * 3 * d
    attn_ew = rows * m.num_patches * d * 4  # scores+softmax+pv, tiny at P<=8
    nl = m.llm_layers
    # floor: activations stream once per matmul in/out per layer
    bb_bytes = nl * rows * (d * 2          # block in/out residual
                            + 3 * d        # qkv out
                            + d            # proj out
                            + 2 * m.llm_mlp_ratio * d) * DT  # mlp hidden rw
    # weights: each base kernel read once per step
    w_bytes = nl * (d * 3 * d + d * d + 2 * m.llm_mlp_ratio * d * d) * DT
    add("gpt2_backbone",
        mxu_flops=nl * (base + lora) + attn_ew,
        bytes_floor=bb_bytes + w_bytes,
        bwd_mult=2.0)  # frozen base: fwd + dX only; LoRA's 3x is r/d-scale noise

    # -- head: trainable 2-layer MLP on (B*N, P*d)
    hid = m.head_input_dim // m.head_hidden_ratio
    add("head",
        mxu_flops=2 * B * N * (m.head_input_dim * hid + hid * m.prediction_horizon),
        bytes_floor=(B * N * (m.head_input_dim + hid + m.prediction_horizon)) * DT
        + (m.head_input_dim * hid + hid * m.prediction_horizon) * DT,
        bwd_mult=3.0)

    # -- optimizer: AdamW on the trainable partition only; pure HBM streaming.
    # count: p,g,m,v read + p,m,v write, fp32 (flattened optax state)
    n_trainable = (
        # embedding tables
        m.num_nodes * m.d_emb + m.num_tod * m.d_emb + m.num_doy * m.d_emb
        + m.num_years * m.d_emb + m.num_seasons * m.d_emb
        # GAT
        + 2 * C * HC + HC + HC
        # convs (+GN affine, 1x1, patcher)
        + sum(
            cin * cout * k
            for cin, cout in zip((C,) + tuple(m.temporal_channel_list[:-1]),
                                 m.temporal_channel_list)
            for k in m.conv_kernel_sizes
        )
        + sum(3 * c * c + c + 2 * 3 * c for c in m.temporal_channel_list)
        + patch_in * m.d_llm + m.d_llm
        # LLM trainables: lora A/B, LNs, wpe
        + nl * (d * m.lora_r + m.lora_r * 3 * d) + (2 * nl + 1) * 2 * d
        + m.llm_max_positions * d
        # head
        + m.head_input_dim * hid + hid + hid * m.prediction_horizon
        + m.prediction_horizon
    )
    add("optimizer_update", 0.0, n_trainable * 7 * 4, bwd_mult=1.0)

    measured = {}
    if args.measured:
        with open(args.measured) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "stage" in rec:
                    measured[rec["stage"]] = rec["ms"]

    name_map = {  # roofline stage -> profile_stages names (fwd, fwd_bwd)
        "embedding": ("embedding_fwd", "embedding_fwd_bwd"),
        "spatial_gat": ("spatial_gat_train_fwd", "spatial_gat_train_fwd_bwd"),
        "temporal_convs": ("temporal_convs_fwd", "temporal_convs_fwd_bwd"),
        "gpt2_backbone": ("gpt2_backbone_train_fwd", "gpt2_backbone_train_fwd_bwd"),
        "head": ("head_fwd", "head_fwd_bwd"),
        "optimizer_update": ("optimizer_update", "optimizer_update"),
    }

    print(f"preset={args.preset} B={B} L={L} N={N} offsets={n_off} "
          f"dtype_bytes={DT} peak={args.peak_tflops}TF/s hbm={args.hbm_gbps}GB/s "
          f"trainable={n_trainable/1e6:.2f}M")
    hdr = (f"{'stage':16s} {'GFLOP':>8s} {'MB':>8s} {'t_mxu':>8s} {'t_hbm':>8s} "
           f"{'light':>8s} {'meas':>8s} {'xlight':>7s} | {'train_light':>11s} "
           f"{'meas':>8s} {'xlight':>7s}")
    print(hdr)
    tot_light_f = tot_light_t = 0.0
    for name, s in stages.items():
        t_mxu = s["mxu_flops"] / peak
        t_hbm = s["bytes"] / bw
        light = max(t_mxu, t_hbm)
        t_light = light * s["bwd_mult"]
        tot_light_f += light
        tot_light_t += t_light
        mf, mt = name_map[name]
        meas_f = measured.get(mf)
        meas_t = measured.get(mt)
        row = (f"{name:16s} {s['mxu_flops']/1e9:8.2f} {s['bytes']/1e6:8.2f} "
               f"{fmt_t(t_mxu)} {fmt_t(t_hbm)} {fmt_t(light)} "
               f"{meas_f:8.2f} {meas_f/1e3/light:7.2f}" if meas_f is not None
               else f"{name:16s} {s['mxu_flops']/1e9:8.2f} {s['bytes']/1e6:8.2f} "
               f"{fmt_t(t_mxu)} {fmt_t(t_hbm)} {fmt_t(light)} {'-':>8s} {'-':>7s}")
        row += (f" | {fmt_t(t_light):>11s} {meas_t:8.2f} {meas_t/1e3/t_light:7.2f}"
                if meas_t is not None else f" | {fmt_t(t_light):>11s} {'-':>8s} {'-':>7s}")
        print(row)
    print(f"{'TOTAL':16s} {'':8s} {'':8s} {'':8s} {'':8s} {fmt_t(tot_light_f)} "
          f"{measured.get('eval_fwd_total', float('nan')):8.2f} {'':7s} "
          f"| {fmt_t(tot_light_t):>11s} "
          f"{measured.get('train_step_total', float('nan')):8.2f}")
    print("(xlight = measured / light bound; fwd TOTAL light vs eval_fwd_total, "
          "train TOTAL vs train_step_total. Stage rows time stages in isolation "
          "— dispatch floors and missing cross-stage fusion make their sum "
          "exceed the fused step.)")


if __name__ == "__main__":
    main()

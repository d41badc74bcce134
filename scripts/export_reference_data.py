"""Export our preprocessed npz splits to the PyTorch reference's on-disk format.

Produces exactly what /root/reference expects in its `data/processed/`:
  {train,val,test}_set.pt  dicts {X (T,H,W,6), Y (T,H,W,L_out), time_features (T,4)}
      float32 torch tensors (reference scripts/preprocess.py:85-104)
  graph_A.pt               {edge_index (2,E) int64, edge_weight (E,) float32}
      (reference src/graph/graph_constructor.py:130-149)
  scaler.joblib / target_scaler.joblib
      sklearn StandardScaler objects rebuilt from our npz scaler params
      (reference feature_engineering.py:146-194, preprocess.py:45-62)

This makes the SAME data bit-for-bit available to both frameworks so the
reference can be trained in-env (scripts/run_reference.py) and its trained
checkpoint compared head-to-head — the BASELINE.md accuracy-parity north star.

Usage:
    python scripts/export_reference_data.py --src /tmp/arena/proc --dst /tmp/refwork/data/processed
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sklearn_scaler(npz_path: str):
    from sklearn.preprocessing import StandardScaler as SkStandardScaler

    data = np.load(npz_path)
    mean = np.asarray(data["mean"], dtype=np.float64)
    scale = np.asarray(data["scale"], dtype=np.float64)
    sk = SkStandardScaler()
    sk.mean_ = mean
    sk.scale_ = scale
    sk.var_ = scale**2  # zero-var columns carry scale 1.0 on both sides
    sk.n_features_in_ = mean.shape[0]
    sk.n_samples_seen_ = 1  # not used by transform/inverse_transform
    return sk


def main() -> None:
    import joblib
    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="our preprocess output dir (npz)")
    p.add_argument("--dst", required=True, help="reference data/processed dir")
    args = p.parse_args()

    with open(os.path.join(args.src, "preprocess_meta.json")) as f:
        meta = json.load(f)
    gh, gw = meta["grid"]
    os.makedirs(args.dst, exist_ok=True)

    for split in ("train", "val", "test"):
        data = np.load(os.path.join(args.src, f"{split}_set.npz"))
        x, y, tf = data["X"], data["Y"], data["time_features"]
        t = x.shape[0]
        assert x.shape[1] == gh * gw, (x.shape, gh, gw)
        out = {
            "X": torch.from_numpy(
                np.ascontiguousarray(x.reshape(t, gh, gw, x.shape[-1]))
            ).float(),
            "Y": torch.from_numpy(
                np.ascontiguousarray(y.reshape(t, gh, gw, y.shape[-1]))
            ).float(),
            "time_features": torch.from_numpy(np.ascontiguousarray(tf)).float(),
        }
        torch.save(out, os.path.join(args.dst, f"{split}_set.pt"))
        print(f"{split}_set.pt: X {tuple(out['X'].shape)} Y {tuple(out['Y'].shape)}")

    graph = np.load(os.path.join(args.src, "graph.npz"))
    torch.save(
        {
            "edge_index": torch.from_numpy(
                graph["edge_index"].astype(np.int64)
            ),
            "edge_weight": torch.from_numpy(
                graph["edge_weight"].astype(np.float32)
            ),
        },
        os.path.join(args.dst, "graph_A.pt"),
    )
    print(f"graph_A.pt: {graph['edge_index'].shape[1]} edges")

    for name in ("scaler", "target_scaler"):
        sk = build_sklearn_scaler(os.path.join(args.src, f"{name}.npz"))
        joblib.dump(sk, os.path.join(args.dst, f"{name}.joblib"))
        print(f"{name}.joblib: mean {sk.mean_} scale {sk.scale_}")


if __name__ == "__main__":
    main()

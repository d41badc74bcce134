"""Host-side batch-assembly throughput: native C++ loader vs numpy fallback.

The counterpart of the reference's torch DataLoader worker pool
(/root/reference/train.py:314-331: 8 workers, prefetch 4). Measures
SlidingWindowDataset.gather_batch both ways on flagship-shaped data and
reports windows/s and GB/s — run on any host (pure CPU, no jax):

    PALLAS_AXON_POOL_IPS= python scripts/bench_loader.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--timesteps", type=int, default=2000)
    p.add_argument("--nodes", type=int, default=2911)
    p.add_argument("--L-in", type=int, default=48)
    p.add_argument("--L-out", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--iters", type=int, default=40)
    args = p.parse_args()

    from tec_mollm_tpu.data import native_loader
    from tec_mollm_tpu.data.dataset import SlidingWindowDataset

    rng = np.random.default_rng(0)
    split = {
        "X": rng.normal(size=(args.timesteps, args.nodes, 6)).astype(np.float32),
        "Y": rng.normal(size=(args.timesteps, args.nodes, args.L_out)).astype(
            np.float32
        ),
        "time_features": rng.integers(
            0, 12, size=(args.timesteps, 4)
        ).astype(np.int32),
    }
    bytes_per_window = (
        args.L_in * args.nodes * 6 * 4
        + args.nodes * args.L_out * 4
        + args.L_in * 4 * 4
    )

    results = {}
    for use_native in (False, True):
        if use_native and not native_loader.available():
            results["native"] = None
            break
        ds = SlidingWindowDataset(
            split, args.L_in, args.L_out, use_native=use_native
        )
        idxs = rng.integers(0, len(ds), size=(args.iters, args.batch_size))
        ds.gather_batch(idxs[0])  # warm (native lib build, page-in)
        t0 = time.perf_counter()
        for i in range(args.iters):
            ds.gather_batch(idxs[i])
        dt = time.perf_counter() - t0
        wps = args.iters * args.batch_size / dt
        results["native" if use_native else "numpy"] = {
            "windows_per_sec": round(wps, 1),
            "GB_per_sec": round(wps * bytes_per_window / 1e9, 2),
        }

    out = {"B": args.batch_size, **results}
    if results.get("native") and results.get("numpy"):
        out["native_speedup"] = round(
            results["native"]["windows_per_sec"]
            / results["numpy"]["windows_per_sec"],
            2,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

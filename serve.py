"""Forecast server CLI: load a checkpoint once, answer warm forecast requests.

Beyond the reference surface (its test.py only scores offline) — see
tec_mollm_tpu/serving/server.py for the API.

    python serve.py --data-dir data/processed --checkpoint latest --port 8901
    curl -s localhost:8901/healthz
    curl -s -X POST localhost:8901/forecast -d '{"indices": [0, 1]}'

--bench N skips the HTTP layer: N warm forecast calls through the service,
printing p50/p95 latency (the serving number recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="TEC-MoLLM forecast server")
    p.add_argument("--data-dir", default="data/processed")
    p.add_argument("--workdir", default=".")
    p.add_argument("--checkpoint", default="latest")
    p.add_argument("--run-name", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--splits", nargs="*", default=["test"])
    p.add_argument("--artifact", default=None,
                   help="serve from an exported StableHLO artifact "
                        "(scripts/export_model.py) instead of restoring the "
                        "checkpoint; --config/--checkpoint still resolve the "
                        "window config, cross-checked against the artifact's "
                        "metadata json")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="dynamic batching: coalesce concurrent requests for up "
                        "to this long into one device dispatch (0 disables)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8901)
    p.add_argument("--bench", type=int, default=0, metavar="N",
                   help="run N warm forecast calls and print latency stats "
                        "instead of serving HTTP")
    p.add_argument("--bench-threads", type=int, default=1,
                   help="issue bench requests from this many concurrent "
                        "threads (shows the dynamic-batching throughput win)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if not args.splits:
        p.error("--splits needs at least one split name (e.g. --splits test)")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tec_mollm_tpu.serving import ForecastService, serve
    from tec_mollm_tpu.utils.logging import setup_logging

    setup_logging(process_index=jax.process_index())

    from tec_mollm_tpu.evaluation.harness import resolve_cli_config

    cfg, checkpoint = resolve_cli_config(
        args.config, args.checkpoint, args.workdir, args.run_name
    )

    # a serial bench with the batching window on would add the full window to
    # every request (no top-up ever arrives), skewing comparisons against the
    # direct-path latencies in BASELINE.md — disable it unless load is
    # actually concurrent
    window_ms = (
        0.0 if (args.bench and args.bench_threads == 1) else args.batch_window_ms
    )
    service = ForecastService(
        cfg, args.data_dir, checkpoint,
        workdir=args.workdir, run_name=args.run_name,
        max_batch=args.max_batch, splits=tuple(args.splits),
        artifact=args.artifact, batch_window_ms=window_ms,
    )

    if args.bench:
        import time

        import numpy as np

        ds_len = service.health()["splits"][args.splits[0]]
        rng = np.random.default_rng(0)
        idxs = [rng.integers(0, ds_len, size=1).tolist() for _ in range(args.bench)]
        t0 = time.perf_counter()
        if args.bench_threads > 1:
            # concurrent load: shows the dynamic-batching win (N requests
            # coalesce into ~N/max_batch device dispatches)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=args.bench_threads) as pool:
                list(pool.map(
                    lambda i: service.forecast(i, args.splits[0]), idxs
                ))
        else:
            for idx in idxs:
                service.forecast(idx, args.splits[0])
        wall = time.perf_counter() - t0
        print(json.dumps({
            **service.stats(), "batch": 1,
            "threads": args.bench_threads,
            "batch_window_ms": window_ms,
            "requests_per_sec": round(args.bench / wall, 2),
        }))
        return

    serve(service, args.host, args.port)


if __name__ == "__main__":
    main()

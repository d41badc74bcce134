"""Tests for the driver-facing entry points in __graft_entry__.py.

Round-1 lesson (VERDICT.md weak #1): a green suite said nothing about the two
functions the driver actually calls — dryrun_multichip(8) failed in the official
run. These tests run both entries on the hermetic 8-device CPU mesh.
"""

import sys

import jax
import numpy as np


def test_dryrun_multichip_8_devices():
    """The exact call the driver makes. conftest already initialized the 8-device
    CPU mesh, exercising the backends-already-initialized branch; the
    uninitialized branch (fresh driver process) is covered by
    test_dryrun_multichip_fresh_process below."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_fresh_process():
    """dryrun_multichip must be self-sufficient in a fresh process with NO env
    help (MULTICHIP_r01 failure mode: driver runs it with 1 visible device)."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # keep the TPU tunnel out of the subprocess (CLAUDE.md rule 3)
    env["PALLAS_AXON_POOL_IPS"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_smoke_tiny():
    """entry()'s construction path at tiny scale: fn is jittable and pure, params
    ride in example_args, output has the (B, L_out, N, 1) contract shape."""
    import __graft_entry__ as ge
    from tec_mollm_tpu.config import tiny_config

    cfg = tiny_config()
    fn, example_args = ge._entry_for(cfg, b=1)
    out = jax.jit(fn)(*example_args)
    m = cfg.model
    assert out.shape == (1, cfg.model.prediction_horizon, m.num_nodes, 1)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_entry_flagship_config_shapes():
    """entry() itself must build the flagship config (2911 nodes, 3 LLM layers) —
    verify the config resolution without paying the full init."""
    import __graft_entry__ as ge

    cfg = ge._full_config()
    assert cfg.model.num_nodes == 2911
    assert cfg.model.llm_layers == 3
    assert cfg.model.d_llm == 768

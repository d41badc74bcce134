"""Test configuration: hermetic, CPU-only, with a virtual 8-device mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY.md §4: the JAX-native
equivalent of a fake multi-device backend is XLA_FLAGS=--xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # N virtual devices on few (sometimes 1) physical cores: a device thread can
    # starve past XLA's default 40 s rendezvous deadline under load, which is a
    # hard process abort. Starvation here is congestion, not deadlock — wait.
    flags = (flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The axon environment registers the TPU plugin from sitecustomize.py, which imports
# jax BEFORE this file runs — env vars alone are read too early to help. The config
# update below is honored as long as no computation has happened yet.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "xla_force_host_platform_device_count=8 not applied"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_cfg():
    from tec_mollm_tpu.config import tiny_config

    return tiny_config()


@pytest.fixture(scope="session")
def tiny_graph(tiny_cfg):
    from tec_mollm_tpu.data.synthetic import grid_coordinates
    from tec_mollm_tpu.graph import build_graph

    lat, lon = grid_coordinates(tiny_cfg.model.grid_h, tiny_cfg.model.grid_w)
    return build_graph(lat, lon, distance_threshold_km=150.0)


@pytest.fixture(scope="session")
def synthetic_hdf5_dir(tmp_path_factory):
    """Two tiny CRIM-layout HDF5 files (2014, 2015) mirroring the reference's
    two-file integration tests (data_loader.py:209-240)."""
    from tec_mollm_tpu.data.synthetic import write_synthetic_hdf5

    d = tmp_path_factory.mktemp("raw")
    paths = []
    for year in (2014, 2015):
        p = d / f"CRIM_SW2hr_AI_v1.2_{year}_DataDrivenRange_CN.hdf5"
        write_synthetic_hdf5(str(p), year=year, num_steps=60, grid_h=5, grid_w=7)
        paths.append(str(p))
    return paths

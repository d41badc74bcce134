"""Device mesh + sharding helpers: the TPU-native replacement for the reference's
torchrun/NCCL/DDP stack (train.py:31-43, :309-310, :353-354).

Strategy (SURVEY.md §2 parallelism inventory): the reference implements exactly one
strategy — data parallelism. Here DP is first-class (batch sharded over the 'data'
mesh axis; gradient mean inserted by GSPMD when params are replicated), and tensor
parallelism over 'model' is additionally available for the GPT-2 backbone + head
(see partitioning.py) — collectives ride ICI, chosen by XLA.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int | None = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh. data_parallel=None uses all remaining devices.

    With the default device set, jax.make_mesh picks a topology-aware device
    order that keeps the trailing (model) axis on adjacent devices, so
    tensor-parallel collectives ride the fastest ICI links. An explicit
    `devices` list (tests, sub-meshes) is honored verbatim via reshape.
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
        data_parallel = n // model_parallel
    if not explicit and data_parallel * model_parallel == n:
        # axis_types=Auto: jax.make_mesh defaults to Explicit (sharding-in-
        # types), which is a different programming model — we only want its
        # topology-aware device ordering, keeping GSPMD auto propagation.
        return jax.make_mesh(
            (data_parallel, model_parallel), (data_axis, model_axis),
            axis_types=(jax.sharding.AxisType.Auto,) * 2,
        )
    if data_parallel * model_parallel != n:
        devices = devices[: data_parallel * model_parallel]
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, axis_names=(data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(tree: Any, shardings: Any) -> Any:
    """Place a host-resident tree onto (possibly multi-host) global shardings.

    Single-process: plain device_put. Multi-process: device_put rejects
    shardings spanning non-addressable devices (found by the first REAL
    2-process run, tests/test_multihost.py — VERDICT r2 #2's predicted bug
    class), so build global jax.Arrays via make_array_from_callback: every
    process holds the full host value (identical-seed init / identical graph),
    and each device reads its own slice. PRNG key arrays route through
    key_data/wrap_key_data (extended dtypes can't be built from callbacks).
    """
    import jax.dtypes

    single = jax.process_count() == 1
    if isinstance(shardings, jax.sharding.Sharding):
        shardings = jax.tree.map(lambda _: shardings, tree)

    def one(x, s):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            if single:
                return jax.device_put(x, s)
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            raw = jax.make_array_from_callback(
                data.shape, s, lambda idx: data[idx]
            )
            return jax.random.wrap_key_data(raw, impl=impl)
        if single:
            return jax.device_put(x, s)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    return jax.tree.map(one, tree, shardings)


def shard_batch(batch: dict[str, Any], mesh: Mesh, data_axis: str = "data") -> dict[str, Any]:
    """Device-put a host batch with batch-dim sharding (the per-host data sharding
    that replaces DistributedSampler)."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def pad_batch_to_size(batch: dict[str, Any], size: int) -> dict[str, Any]:
    """Pad the leading dim to exactly `size` rows (repeating the last row);
    padded rows get valid=False."""
    b = next(iter(batch.values())).shape[0]
    if b > size:
        raise ValueError(f"batch of {b} rows cannot pad down to {size}")
    if b == size:
        return batch
    pad = size - b
    out = {}
    for k, v in batch.items():
        pad_block = np.repeat(v[-1:], pad, axis=0)
        out[k] = np.concatenate([v, pad_block], axis=0)
    if "valid" in out:
        out["valid"][-pad:] = False
    else:
        valid = np.ones(size, dtype=bool)
        valid[-pad:] = False
        out["valid"] = valid
    return out


def pad_batch_to_multiple(batch: dict[str, Any], multiple: int) -> dict[str, Any]:
    """Pad the leading dim up to the next multiple; padded rows get valid=False."""
    b = next(iter(batch.values())).shape[0]
    return pad_batch_to_size(batch, -(-b // multiple) * multiple)

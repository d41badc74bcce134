"""Device-resident archive: the split's raw series lives in HBM; windows are
gathered on device inside the jitted step instead of streamed from the host.

Why this exists (TPU-first design, no reference counterpart): the materialized
sliding-window dataset the reference streams per batch (dataset.py:79-92 of
/root/reference, torch DataLoader workers train.py:314-331) is ~48x redundant —
every timestep appears in L_in windows, and the five space-weather indices are
broadcast to all N nodes before batching. The de-duplicated raw form is

    TEC (T_raw, N) float32  +  indices (T_raw, 5)  +  time features (T_x, 4)

which is ~0.5 GB for the full 13-year archive — small enough to reside entirely
in one chip's HBM. Batches are then index-driven: the host sends only the
per-step window-start indices (a few hundred bytes), and a fused gather +
affine-scaling + broadcast inside the jitted train/eval step reconstructs the
exact (B, L, N, 6) / (B, N, L_out) arrays the host pipeline would have fed.
At stride-1 archive scale this removes ~66 GB/epoch of host->device traffic
(measured tunnel-bound at 1-2 h/epoch in round 3 — BASELINE.md 13-year rows)
and makes training compute-bound.

Numerical contract: bit-parity with the host pipeline. The preprocess CLI
scales X/Y with float32 affines `(raw - mean_f32) * (1/scale)_f32`
(data/scaler.py::StandardScaler._affine); the device gather applies the same
f32 constants in the same order, so gathered batches equal the {split}_set.npz
windows bit-for-bit (tests/test_device_data.py asserts exact equality).

Consumed via ``train.py --device-data`` / ``TrainConfig.device_data``.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
from flax import struct

import jax.numpy as jnp


class DeviceSplit(struct.PyTreeNode):
    """The on-device half: a pytree of raw arrays + a jittable window gather.

    Passed as an explicit argument to the jitted step (never closed over, which
    would bake a second copy of the archive into the executable as constants).
    """

    tec: Any            # (T_raw, N) f32 — raw physical TEC
    sw: Any             # (T_raw, 5) f32 — raw space-weather indices
    tf: Any             # (T_x, 4) int32 — time features (already truncated)
    feat_shift: Any     # (6,) f32 — feature-scaler mean
    feat_mul: Any       # (6,) f32 — 1/scale, pre-inverted in f64 then cast
    tgt_shift: Any      # () f32 — target-scaler mean
    tgt_mul: Any        # () f32
    L_in: int = struct.field(pytree_node=False)
    L_out: int = struct.field(pytree_node=False)
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

    def gather(self, starts, valid=None) -> dict[str, Any]:
        """starts (B,) int32 window-start indices -> the batch the host
        pipeline would have assembled: x (B, L_in, N, C) in compute_dtype,
        y (B, N, L_out) f32, time_features (B, L_in, 4) int32."""
        L, H = self.L_in, self.L_out
        b = starts.shape[0]
        n = self.tec.shape[1]
        win = starts[:, None] + jnp.arange(L, dtype=starts.dtype)      # (B, L)
        tec_w = jnp.take(self.tec, win, axis=0)                        # (B, L, N)
        x0 = (tec_w - self.feat_shift[0]) * self.feat_mul[0]
        sw_w = (jnp.take(self.sw, win, axis=0) - self.feat_shift[1:]) \
            * self.feat_mul[1:]                                        # (B, L, 5)
        x = jnp.concatenate(
            [x0[..., None], jnp.broadcast_to(sw_w[:, :, None, :], (b, L, n, 5))],
            axis=-1,
        ).astype(self.compute_dtype)
        # y[b, n, h] = scaled TEC[start + L_in + h, n]: the value-level target
        # identity Y[t][h] == tec[t + 1 + h] at t = start + L_in - 1
        # (reference feature_engineering.py:63-65, dataset.py:89-92)
        tgt = starts[:, None] + L + jnp.arange(H, dtype=starts.dtype)  # (B, H)
        y = (jnp.take(self.tec, tgt, axis=0) - self.tgt_shift) * self.tgt_mul
        batch = {
            "x": x,
            "y": jnp.transpose(y, (0, 2, 1)),                          # (B, N, H)
            "time_features": jnp.take(self.tf, win, axis=0),           # (B, L, 4)
        }
        if valid is not None:
            batch["valid"] = valid
        return batch


class DeviceResidentDataset:
    """Host-side half: loads the raw npz + scalers, owns the window index
    space (same semantics as SlidingWindowDataset: sample_indices, tail_frac),
    and materializes host batches on demand (model init, parity tests).

    BatchLoader(index_only=True) drives it: each "batch" is just the window
    starts + validity mask; DeviceSplit.gather does the rest on device.
    """

    def __init__(
        self,
        data_dir: str,
        mode: str,
        L_in: int,
        L_out: int,
        stride: int = 1,
        tail_frac: float = 1.0,
    ):
        raw_path = os.path.join(data_dir, f"{mode}_raw.npz")
        if not os.path.exists(raw_path):
            raise FileNotFoundError(
                f"{raw_path} not found — the device-resident path needs the "
                "de-duplicated raw series written by the preprocess CLI "
                "(re-run `python -m tec_mollm_tpu.data.preprocess` with this "
                "repo version; archives predating the *_raw.npz export only "
                "support the host pipeline)"
            )
        with np.load(raw_path) as d:
            self.tec = np.ascontiguousarray(d["tec"], dtype=np.float32)
            self.sw = np.ascontiguousarray(d["sw"], dtype=np.float32)
            self.segment_id = (
                np.asarray(d["segment_id"]) if "segment_id" in d else None
            )
        # time features: small, already truncated to len(X) = T_raw - horizon
        with np.load(os.path.join(data_dir, f"{mode}_set.npz")) as d:
            self.tf = np.ascontiguousarray(d["time_features"], dtype=np.int32)
        with open(os.path.join(data_dir, "preprocess_meta.json")) as f:
            self.horizon = int(json.load(f)["horizon"])
        if L_out > self.horizon:
            raise ValueError(
                f"L_out={L_out} exceeds the archive horizon {self.horizon}"
            )
        from tec_mollm_tpu.data.scaler import StandardScaler

        feat = StandardScaler.load(os.path.join(data_dir, "scaler.npz"))
        tgt = StandardScaler.load(os.path.join(data_dir, "target_scaler.npz"))
        # EXACT StandardScaler._affine semantics: shift = mean cast to f32,
        # mul = 1/scale computed in f64 THEN cast to f32
        self.feat_shift = feat.mean_.astype(np.float32)
        self.feat_mul = (1.0 / feat.scale_).astype(np.float32)
        self.tgt_shift = np.float32(tgt.mean_[0])
        self.tgt_mul = np.float32(1.0 / tgt.scale_[0])

        self.L_in = L_in
        self.L_out = L_out
        self.stride = stride
        # identical window-index semantics to SlidingWindowDataset over the
        # truncated X (len = T_raw - horizon): max_start = len(X) - L_in - L_out + 1
        n_x = self.tec.shape[0] - self.horizon
        max_start = n_x - L_in - L_out + 1
        self.sample_indices = (
            np.arange(0, max_start, stride, dtype=np.int64)
            if max_start > 0
            else np.zeros((0,), dtype=np.int64)
        )
        if self.segment_id is not None and len(self.sample_indices):
            # gap tolerance: same filter as SlidingWindowDataset — the on-device
            # gather indexes raw positions, so windows spanning an archive
            # discontinuity must never enter the index space
            from tec_mollm_tpu.data.hdf5_io import valid_window_starts

            self.sample_indices = valid_window_starts(
                self.sample_indices, self.segment_id, L_in, L_out
            )
        if not 0.0 < tail_frac <= 1.0:
            raise ValueError(f"tail_frac must be in (0, 1], got {tail_frac}")
        self.tail_frac = tail_frac
        if tail_frac < 1.0 and len(self.sample_indices):
            keep = max(1, int(np.ceil(tail_frac * len(self.sample_indices))))
            self.sample_indices = self.sample_indices[-keep:]

    def __len__(self) -> int:
        return len(self.sample_indices)

    def nbytes(self) -> int:
        """HBM footprint of the device-resident arrays."""
        return self.tec.nbytes + self.sw.nbytes + self.tf.nbytes

    def device_split(self, compute_dtype=jnp.float32, put=None) -> DeviceSplit:
        """Materialize the on-device half. `put` maps host array -> device
        array (e.g. replicated put_global on a mesh); identity when None."""
        if put is None:
            put = jnp.asarray
        return DeviceSplit(
            tec=put(self.tec),
            sw=put(self.sw),
            tf=put(self.tf),
            feat_shift=put(self.feat_shift),
            feat_mul=put(self.feat_mul),
            tgt_shift=put(self.tgt_shift),
            tgt_mul=put(self.tgt_mul),
            L_in=self.L_in,
            L_out=self.L_out,
            compute_dtype=compute_dtype,
        )

    def gather_batch(self, idxs: np.ndarray) -> dict[str, np.ndarray]:
        """Host-side materialization (numpy mirror of DeviceSplit.gather) —
        used for model init shapes and the bit-parity tests; the training path
        never calls this."""
        starts = self.sample_indices[idxs]
        L, H = self.L_in, self.L_out
        win = starts[:, None] + np.arange(L)
        tec_w = self.tec[win]                                          # (B, L, N)
        x0 = (tec_w - self.feat_shift[0]) * self.feat_mul[0]
        sw_w = (self.sw[win] - self.feat_shift[1:]) * self.feat_mul[1:]
        b, n = len(starts), self.tec.shape[1]
        x = np.concatenate(
            [x0[..., None], np.broadcast_to(sw_w[:, :, None, :], (b, L, n, 5))],
            axis=-1,
            dtype=np.float32,
        )
        tgt = starts[:, None] + L + np.arange(H)
        y = (self.tec[tgt] - self.tgt_shift) * self.tgt_mul
        return {
            "x": x,
            "y": np.ascontiguousarray(y.transpose(0, 2, 1), dtype=np.float32),
            "time_features": self.tf[win],
        }

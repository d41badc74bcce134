"""Sliding-window dataset + host-side batch pipeline.

Behavioral contract (reference /root/reference/src/data/dataset.py):
  * samples = range(0, T - L_in - L_out + 1, stride) (dataset.py:46-53);
  * item i: x = X[i : i+L_in], time_features = tf[i : i+L_in],
    y = Y[i + L_in - 1] (Y is pre-aligned so that index t holds the L_out future
    steps of window ending at t; dataset.py:79-92).

Differences from the reference (deliberate, TPU-first):
  * processed arrays are stored node-flattened: X (T, N, C), Y (T, N, L_out) — the
    (B, L, H, W, C) -> (B, L, H*W, C) reshape the reference does per batch
    (train.py:58-65) happens once offline;
  * time features stay (L, 4) per sample; the model broadcasts them over nodes on
    device instead of the reference's host-side expand to (B, L, N, 4);
  * batches are assembled by a background prefetch thread (replacing torch DataLoader
    workers, train.py:314-331) and can be sharded per host for multi-process DP
    (replacing DistributedSampler, train.py:309-310).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class SlidingWindowDataset:
    """Windowed view over a processed split {X, Y, time_features}."""

    def __init__(
        self,
        data: dict[str, np.ndarray],
        L_in: int,
        L_out: int,
        stride: int = 1,
        use_native: bool | None = None,
        tail_frac: float = 1.0,
    ):
        self.X = np.ascontiguousarray(data["X"], dtype=np.float32)
        self.Y = np.ascontiguousarray(data["Y"], dtype=np.float32)
        self.time_features = np.ascontiguousarray(data["time_features"], dtype=np.int32)
        if self.X.ndim != 3 or self.Y.ndim != 3:
            raise ValueError(
                f"Expect node-flattened X (T,N,C) / Y (T,N,L_out); got {self.X.shape} / "
                f"{self.Y.shape}. Use preprocess to flatten the grid."
            )
        self.L_in = L_in
        self.L_out = L_out
        self.stride = stride
        if use_native is None:  # auto: use the C assembler when it builds/loads
            from tec_mollm_tpu.data import native_loader

            use_native = native_loader.available()
        self.use_native = use_native
        max_start = len(self.X) - L_in - L_out + 1
        self.sample_indices = (
            np.arange(0, max_start, stride, dtype=np.int64)
            if max_start > 0
            else np.zeros((0,), dtype=np.int64)
        )
        # gap tolerance (cadence_policy='segment'): a raw-length segment_id
        # array drops exactly the windows whose [start, start+L_in+L_out)
        # span crosses an archive discontinuity or a flagged-bad timestep
        segment_id = data.get("segment_id")
        if segment_id is not None and len(self.sample_indices):
            from tec_mollm_tpu.data.hdf5_io import valid_window_starts

            before = len(self.sample_indices)
            self.sample_indices = valid_window_starts(
                self.sample_indices, np.asarray(segment_id), L_in, L_out
            )
            dropped = before - len(self.sample_indices)
            if dropped:
                import logging

                logging.getLogger(__name__).info(
                    "segment filter: dropped %d/%d windows spanning gaps",
                    dropped, before,
                )
        # tail_frac < 1 keeps only the chronologically LAST fraction of windows:
        # under distribution shift (solar cycle) the split's tail is the closest
        # proxy for the deployment epoch, and selecting checkpoints on the full
        # in-distribution val period misranks arms (BASELINE.md "RevIN under
        # distribution shift": sc3 base had the better full-period val yet lost
        # the shifted test by 21 MAE points).
        if not 0.0 < tail_frac <= 1.0:
            raise ValueError(f"tail_frac must be in (0, 1], got {tail_frac}")
        self.tail_frac = tail_frac
        if tail_frac < 1.0 and len(self.sample_indices):
            keep = max(1, int(np.ceil(tail_frac * len(self.sample_indices))))
            self.sample_indices = self.sample_indices[-keep:]

    @classmethod
    def from_dir(
        cls,
        data_dir: str,
        mode: str,
        L_in: int,
        L_out: int,
        stride: int = 1,
        tail_frac: float = 1.0,
    ):
        """Load '{mode}_set.npz' written by the preprocess CLI."""
        import os

        path = os.path.join(data_dir, f"{mode}_set.npz")
        with np.load(path) as d:
            data = {k: d[k] for k in ("X", "Y", "time_features")}
            if "segment_id" in d:
                data["segment_id"] = d["segment_id"]
        return cls(data, L_in=L_in, L_out=L_out, stride=stride, tail_frac=tail_frac)

    def __len__(self) -> int:
        return len(self.sample_indices)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        start = int(self.sample_indices[idx])
        return {
            "x": self.X[start : start + self.L_in],
            "y": self.Y[start + self.L_in - 1],
            "time_features": self.time_features[start : start + self.L_in],
        }

    def gather_batch(self, idxs: np.ndarray) -> dict[str, np.ndarray]:
        """Assemble a batch: native multithreaded memcpy (native/tecloader.cpp) when
        available, vectorized numpy fancy indexing otherwise."""
        starts = self.sample_indices[idxs]
        if self.use_native:
            from tec_mollm_tpu.data import native_loader

            return native_loader.gather_windows(
                self.X, self.Y, self.time_features, starts, self.L_in
            )
        window = starts[:, None] + np.arange(self.L_in)[None, :]
        return {
            "x": self.X[window],  # (B, L, N, C)
            "y": self.Y[starts + self.L_in - 1],  # (B, N, L_out)
            "time_features": self.time_features[window],  # (B, L, 4)
        }


class BatchLoader:
    """Iterates batches with optional shuffling, per-host sharding, and prefetch.

    drop_remainder=True keeps shapes static for jit (one compilation). For eval the
    remainder can matter; use drop_remainder=False and the final short batch is padded
    to full size with `pad` flag so metrics can mask it out.
    """

    def __init__(
        self,
        dataset: SlidingWindowDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        index_only: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        # index_only: yield {'starts': window-start indices} instead of
        # materialized windows — the device-resident path (data/device_data.py)
        # gathers on device, so the host only ships a few bytes per step
        self.index_only = index_only
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle deterministically per epoch (DistributedSampler.set_epoch parity,
        reference train.py:382)."""
        self.epoch = epoch

    def _epoch_indices(self) -> tuple[np.ndarray, int]:
        """Returns (order, pad): this shard's dataset indices plus the count of
        trailing PADDING entries (repeats of the last real index) appended so
        every shard has the same length — entries the consumer must mask out."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        # strided shard per host (order[rank::world] — DistributedSampler
        # semantics, reference train.py:309). Strided (not contiguous) so the
        # UNION of all hosts' batch b equals the rows a single process would put
        # in macro batch b: per-step losses then match across process counts up
        # to reduction order (tests/test_multihost.py).
        pad = 0
        if self.num_shards > 1:
            shard = order[self.shard_index :: self.num_shards]
            if self.drop_remainder:
                # training: truncate to equal sizes (drop_last semantics)
                shard = shard[: n // self.num_shards]
            else:
                # eval: no window may be dropped. Pad the short shards to
                # ceil(n/shards) with repeats of their last index, marked
                # invalid below, so every process still dispatches the same
                # number of identically-shaped steps (collective-safe).
                per_shard = -(-n // self.num_shards)
                pad = per_shard - len(shard)
                if pad:
                    # an EMPTY shard (more shards than windows) borrows an
                    # index from the full order — it still has to dispatch the
                    # same fully-masked steps as its peers
                    fill = shard[-1:] if len(shard) else order[-1:]
                    shard = np.concatenate([shard, np.repeat(fill, pad)])
            order = shard
        return order, pad

    def __len__(self) -> int:
        order, _ = self._epoch_indices()
        n = len(order)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _gather(self, idxs: np.ndarray) -> dict[str, np.ndarray]:
        if self.index_only:
            return {
                "starts": np.asarray(
                    self.dataset.sample_indices[idxs], dtype=np.int32
                )
            }
        return self.dataset.gather_batch(idxs)

    def _batches(self, start_step: int = 0) -> Iterator[dict[str, np.ndarray]]:
        order, shard_pad = self._epoch_indices()
        # index-level validity: the trailing shard_pad entries are repeats
        valid_all = np.ones(len(order), dtype=bool)
        if shard_pad:
            valid_all[len(order) - shard_pad :] = False
        n_full = len(order) // self.batch_size
        for b in range(start_step, n_full):
            sl = slice(b * self.batch_size, (b + 1) * self.batch_size)
            batch = self._gather(order[sl])
            batch["valid"] = valid_all[sl].copy()
            yield batch
        rem = len(order) - n_full * self.batch_size
        if rem and not self.drop_remainder and start_step <= n_full:
            idxs = order[n_full * self.batch_size :]
            pad = np.concatenate([idxs, np.repeat(idxs[-1:], self.batch_size - rem)])
            batch = self._gather(pad)
            valid = np.zeros(self.batch_size, dtype=bool)
            valid[:rem] = valid_all[n_full * self.batch_size :]
            batch["valid"] = valid
            yield batch

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        return self.iter_from(0)

    def iter_from(self, start_step: int = 0) -> Iterator[dict[str, np.ndarray]]:
        """Iterate this epoch's batches starting at batch index `start_step`
        (mid-epoch resume: the epoch's order is a pure function of seed+epoch,
        so skipping the first k batches reproduces exactly the continuation the
        interrupted run would have seen — nothing is gathered for the skipped
        ones)."""
        if self.prefetch <= 0:
            yield from self._batches(start_step)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list[BaseException] = []

        def producer():
            try:
                for batch in self._batches(start_step):
                    q.put(batch)
            except BaseException as e:  # propagate into consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item

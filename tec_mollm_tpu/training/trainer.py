"""Trainer: epoch loop, validation, early stopping, checkpointing, resume.

Orchestration parity with the reference's main loop (train.py:200-460):
  * per-epoch: loader.set_epoch -> train epoch -> validate -> (rank 0) log,
    best-checkpoint on val-loss improvement > min_delta, early stop on patience;
  * detailed per-horizon metric dump every `log_every_epochs` epochs
    (train.py:400-434);
  * effective batch = batch_size * accumulation_steps * data_parallel
    (README.md:97).

Beyond the reference (SURVEY.md §5 gaps): full train-state resume (optimizer,
scheduler step, rng, epoch, patience counter), structured jsonl history, and
device-sharded input via the mesh instead of DDP/DistributedSampler.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tec_mollm_tpu.config import Config
from tec_mollm_tpu.data.dataset import BatchLoader, SlidingWindowDataset
from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.graph.builder import GraphData
from tec_mollm_tpu.models.tec_mollm import TECMoLLM
from tec_mollm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_global,
    replicated_sharding,
)
from tec_mollm_tpu.parallel.partitioning import param_shardings
from tec_mollm_tpu.training.checkpoint import CheckpointManager
from tec_mollm_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    point_forecast,
)
from tec_mollm_tpu.utils.run_name import make_run_name

logger = logging.getLogger(__name__)


def _sync_stop_flag(flag: bool) -> bool:
    """Agree on a stop decision across processes: ANY host's signal stops all.

    Signals are per-process, so the stop flag is host-local; acting on it
    directly at the epoch boundary would desync a pod — the signaled host
    exits while its peers enter the next epoch and wedge in its first
    collective. Called right after the epoch-boundary collective save, which
    has drained outstanding work, so one more tiny all-gather is safe (cf.
    validate()'s inflight-queue note)."""
    if jax.process_count() == 1:
        return flag
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(flag, dtype=np.int32))
    return bool(np.asarray(flags).any())


class Trainer:
    def __init__(
        self,
        cfg: Config,
        train_ds: SlidingWindowDataset,
        val_ds: SlidingWindowDataset | None,
        graph: GraphData,
        target_scaler: StandardScaler | None,
        workdir: str = ".",
        run_name: str | None = None,
        mesh=None,
    ):
        cfg = cfg.resolved()
        self.cfg = cfg
        self.workdir = workdir
        self.run_name = run_name or make_run_name(
            cfg.train.L_in,
            cfg.train.train_stride,
            cfg.train.batch_size,
            cfg.train.lr,
            cfg.model.llm_layers,
        )
        self.mesh = mesh if mesh is not None else make_mesh(
            model_parallel=cfg.train.model_parallel,
            data_axis=cfg.train.data_axis,
            model_axis=cfg.train.model_axis,
        )
        self.dp = self.mesh.shape[cfg.train.data_axis]
        from tec_mollm_tpu.models.tec_mollm import graph_inputs

        stencil_shifts, graph_arrays = graph_inputs(graph)
        self.model = TECMoLLM(
            cfg.model,
            dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
            remat_llm=cfg.train.remat_llm,
            remat_policy=cfg.train.remat_policy,
            stencil_shifts=stencil_shifts,
        )
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.target_scaler = target_scaler
        self.ckpt = CheckpointManager(workdir, self.run_name)

        # Device-resident data mode (data/device_data.py): the split's raw
        # series lives in HBM; loaders ship only window-start indices and the
        # jitted steps gather on device. Selected by constructing the Trainer
        # with DeviceResidentDataset instances (train.py --device-data).
        from tec_mollm_tpu.data.device_data import DeviceResidentDataset

        self.device_mode = isinstance(train_ds, DeviceResidentDataset)

        # macro batch = accumulation * microbatch * data-parallel replicas
        self.macro_batch = (
            cfg.train.accumulation_steps * cfg.train.batch_size * self.dp
        )
        # per-host sharding (multi-host pods): each process loads its slice of the
        # index space — the role DistributedSampler plays in the reference
        # (train.py:309-310). Single host => one shard.
        # drop_remainder=False: the final short macro batch is PADDED with
        # loss-masked repeats instead of dropped, so every train window
        # contributes a gradient each epoch — the effective semantics of the
        # reference's trailing-accumulation flush (train.py:117-126, §2.d.4).
        self.train_loader = BatchLoader(
            train_ds,
            batch_size=self.macro_batch // jax.process_count(),
            shuffle=cfg.train.shuffle,
            seed=cfg.train.seed,
            drop_remainder=False,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
            index_only=self.device_mode,
        )
        # validation is sharded per process exactly like training (ADVICE r1:
        # an unsharded val loader + make_array_from_process_local_data treats each
        # host's FULL batch as a local shard on multihost pods). With
        # drop_remainder=False the BatchLoader PADS short shards with masked
        # repeats (never drops a window), so hosts stay in lockstep for the
        # collective eval steps while every val window is scored exactly once.
        val_global_batch = max(cfg.train.batch_size * self.dp, self.dp)
        self.val_loader = (
            BatchLoader(
                val_ds,
                batch_size=val_global_batch // jax.process_count(),
                shuffle=False,
                drop_remainder=False,
                num_shards=jax.process_count(),
                shard_index=jax.process_index(),
                index_only=self.device_mode,
            )
            if val_ds is not None
            else None
        )

        # graph device constants (replicated; put_global handles multihost)
        rep = replicated_sharding(self.mesh)
        self.graph_dev = tuple(put_global(a, rep) for a in graph_arrays)

        # device-resident raw series (replicated over the mesh; ~0.5 GB/chip
        # at full 13-year archive scale). Passed as explicit jit arguments —
        # never closed over, which would bake a second copy into the executable.
        self._train_data = self._val_data = None
        if self.device_mode:
            data_dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
            put_rep = lambda a: put_global(np.asarray(a), rep)  # noqa: E731
            self._train_data = train_ds.device_split(data_dtype, put_rep)
            if val_ds is not None:
                if not isinstance(val_ds, DeviceResidentDataset):
                    raise TypeError(
                        "device-resident mode needs DeviceResidentDataset for "
                        "the validation split too"
                    )
                self._val_data = val_ds.device_split(data_dtype, put_rep)
            logger.info(
                "device-resident data: train %.1f MB%s on-chip (replicated)",
                train_ds.nbytes() / 1e6,
                f" + val {val_ds.nbytes() / 1e6:.1f} MB" if val_ds is not None else "",
            )

        # init state: trainable fp32, frozen bf16 under the bf16 policy (streamed
        # weights; no optimizer state to keep in fp32)
        sample = train_ds.gather_batch(np.arange(min(1, len(train_ds))))
        state, tx, self._mask = create_train_state(
            self.model, cfg,
            jax.random.key(cfg.train.seed, impl=cfg.train.prng_impl),
            sample, self.graph_dev,
            frozen_dtype=jnp.bfloat16 if cfg.train.bf16 else None,
        )
        # Every leaf of the state must live on the mesh: params per their specs,
        # opt_state/step/rng replicated (adam moments inherit the params' layout
        # through the first jitted update).
        state = state.replace(
            trainable=put_global(
                state.trainable,
                param_shardings(state.trainable, self.mesh, cfg.train.model_parallel,
                                cfg.train.model_axis),
            ),
            frozen=put_global(
                state.frozen,
                param_shardings(state.frozen, self.mesh, cfg.train.model_parallel,
                                cfg.train.model_axis),
            ),
            opt_state=put_global(state.opt_state, rep),
            step=put_global(state.step, rep),
            rng=put_global(state.rng, rep),
            # the EMA shadows the trainable tree -> identical shardings
            ema=(
                put_global(
                    state.ema,
                    param_shardings(state.ema, self.mesh, cfg.train.model_parallel,
                                    cfg.train.model_axis),
                )
                if state.ema is not None
                else None
            ),
        )
        self.state = state
        self._train_step = jax.jit(
            make_train_step(self.model, cfg, tx, gather=self.device_mode),
            donate_argnums=0,
        )
        _eval = make_eval_step(self.model, cfg, gather=self.device_mode)

        def _eval_point(params, batch, graph, data=None):
            # validation streams POINT metrics; slicing the 0.5 level here keeps
            # it inside the one jitted program (no extra per-batch dispatch,
            # which multi-process meshes cannot afford — DESIGN §16)
            loss, preds, trues = _eval(params, batch, graph, data)
            return loss, point_forecast(preds, cfg), trues

        self._eval_step = jax.jit(_eval_point)
        self.batch_sharding = batch_sharding(self.mesh, cfg.train.data_axis)

        self.epoch = 0
        self.best_val_loss = float("inf")
        self.patience_counter = 0
        self.history: list[dict[str, Any]] = []
        os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)
        self._history_path = os.path.join(workdir, "logs", f"{self.run_name}.jsonl")

    # ------------------------------------------------------------------

    def set_params(self, merged_params) -> None:
        """Replace the model parameters from a merged tree (e.g. imported
        reference/HF weights), preserving the trainable/frozen split and dtypes."""
        from tec_mollm_tpu.training.train_state import partition_params

        trainable, frozen = partition_params(merged_params, self._mask)
        if self.cfg.train.bf16:
            frozen = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), frozen)
        trainable = jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), trainable)
        self.state = self.state.replace(
            trainable=put_global(
                trainable,
                param_shardings(trainable, self.mesh, self.cfg.train.model_parallel,
                                self.cfg.train.model_axis),
            ),
            frozen=put_global(
                frozen,
                param_shardings(frozen, self.mesh, self.cfg.train.model_parallel,
                                self.cfg.train.model_axis),
            ),
        )

    def _put(self, batch: dict[str, np.ndarray]) -> dict[str, jnp.ndarray]:
        arrays = dict(batch)
        if self.cfg.train.bf16 and "x" in arrays:
            # the model casts x to bf16 anyway; casting on the host halves the
            # host->device bytes for the biggest tensor (y stays fp32 for the
            # loss). Index batches (device mode) have no 'x' — nothing to cast.
            arrays["x"] = arrays["x"].astype(jnp.bfloat16)
        if jax.process_count() > 1:
            # each host contributes its local shard of the global batch
            return {
                k: jax.make_array_from_process_local_data(self.batch_sharding, v)
                for k, v in arrays.items()
            }
        return jax.tree.map(lambda x: jax.device_put(x, self.batch_sharding), arrays)

    def train_epoch(
        self,
        start_step: int = 0,
        stop_requested: dict[str, bool] | None = None,
    ) -> dict[str, float]:
        """One (possibly partial) training epoch.

        start_step > 0 resumes a mid-epoch checkpoint: the epoch's batch order
        is a pure function of seed+epoch, so skipping the first k batches
        continues exactly where the interrupted run stopped. `stop_requested`
        is polled each macro step on single-process runs (a signal mid-epoch
        checkpoints within one step instead of waiting for the epoch boundary);
        multi-process keeps epoch-boundary stop semantics — the flag is
        host-local and a lone host breaking out of the collective step sequence
        would wedge its peers."""
        self.train_loader.set_epoch(self.epoch)
        device_losses = []
        steps = start_step
        interrupted = False
        ckpt_every = self.cfg.train.checkpoint_every_steps
        t0 = time.perf_counter()
        for batch in self.train_loader.iter_from(start_step):
            self.state, metrics = self._train_step(
                self.state, self._put(batch), self.graph_dev, self._train_data
            )
            # keep losses on device: a float() here would hard-sync every step
            # (one tunnel RTT per step on remote backends); read back once below
            device_losses.append(metrics["loss"])
            steps += 1
            sync_every = self.cfg.train.host_sync_every
            if sync_every and steps % sync_every == 0:
                # periodic pipeline drain: without it, every staged batch buffer
                # of the epoch stays pinned on the host (OOM at archive scale —
                # see TrainConfig.host_sync_every). The readback doubles as a
                # divergence tripwire: a NaN/inf loss must abort BEFORE the next
                # periodic checkpoint overwrites 'latest' with poisoned state
                # (a padded-GAT NaN once trained blind for a full archive epoch
                # and clobbered the only resumable checkpoint — round 4)
                self._check_finite(float(metrics["loss"]), steps)
            if ckpt_every and steps % ckpt_every == 0:
                # the state about to be persisted must be finite (one extra
                # readback per save; ckpt_every is hundreds of steps)
                self._check_finite(float(metrics["loss"]), steps)
                # every host reaches the same step count -> collective-safe
                self._save_latest(step_in_epoch=steps)
            if (
                stop_requested is not None
                and stop_requested["flag"]
                and jax.process_count() == 1
            ):
                interrupted = True
                break
        # same two-regime reduction as validate() (DESIGN §16): multi-process
        # must not dispatch eager multi-host adds on top of outstanding
        # collectives (deadlocks XLA:CPU's bounded inflight queue) — read the
        # replicated scalars back and reduce on host; single-process keeps the
        # enqueue-only device sum with one readback (one tunnel RTT total)
        if device_losses and jax.process_count() > 1:
            total_loss = sum(float(l) for l in device_losses)
        elif device_losses:
            total_loss = float(sum(device_losses))
        else:
            total_loss = 0.0
        dt = time.perf_counter() - t0
        steps_this_run = steps - start_step
        windows = steps_this_run * self.macro_batch
        self._check_finite(total_loss, steps)
        return {
            "train_loss": total_loss / max(steps_this_run, 1),
            "updates": steps_this_run,
            "steps_in_epoch": steps,
            "interrupted": interrupted,
            "windows_per_sec": windows / dt if dt > 0 else 0.0,
        }

    def validate(self) -> tuple[float, dict[str, Any]]:
        """Streaming validation: per-batch metrics reduce on device to (L_out, 8)
        sufficient statistics — no prediction tensors ever reach the host (unlike
        the reference, which concatenates everything, train.py:153-164)."""
        assert self.val_loader is not None
        from tec_mollm_tpu.evaluation.streaming import StreamingHorizonMetrics

        acc = StreamingHorizonMetrics(self.cfg.train.L_out, self.target_scaler)
        loss_terms: list[tuple[Any, Any]] = []
        for batch in self.val_loader:
            dev_batch = self._put(batch)  # 'valid' shards with the rest of the batch
            valid_dev = dev_batch["valid"]
            loss, preds, trues = self._eval_step(
                # EMA runs validate (and therefore best-checkpoint selection)
                # on the averaged weights; identity when ema_decay is off
                self.state.eval_params, dev_batch, self.graph_dev, self._val_data
            )
            # global valid count on device (sharded sum -> replicated scalar);
            # weighting by the host-local count would be wrong on multihost pods
            loss_terms.append((loss, jnp.sum(valid_dev)))
            acc.update(trues, preds, valid_dev)
            sync_every = self.cfg.train.host_sync_every
            if sync_every and len(loss_terms) % sync_every == 0:
                float(loss)  # bound in-flight staged batches (host_sync_every)
        # Single process: stack on device, read back ONCE, reduce in float64 on
        # host — a per-batch float() costs one tunnel RTT each (~30 s/epoch at
        # stride-1 full-archive validation). Multi-process: dispatching one more
        # eager multi-host program on top of ~2N outstanding Gloo collectives
        # deadlocks XLA:CPU's bounded inflight-computation queue (both workers
        # observed blocked in apply_primitive at this stack); reduce on host —
        # the readbacks of replicated scalars are plain D2H transfers, not
        # programs, and retire the queue in order.
        if loss_terms and jax.process_count() > 1:
            total = float(sum(float(l) * float(n) for l, n in loss_terms))
            count = float(sum(float(n) for _, n in loss_terms))
        elif loss_terms:
            stacked = np.asarray(
                jnp.stack([jnp.stack([l, n]) for l, n in loss_terms]),
                dtype=np.float64,
            )
            total = float(np.sum(stacked[:, 0] * stacked[:, 1]))
            count = float(np.sum(stacked[:, 1]))
        else:
            total = count = 0.0
        avg_loss = total / max(count, 1.0)
        return avg_loss, acc.finalize()

    def _check_finite(self, loss: float, steps: int) -> None:
        """Abort on training divergence BEFORE any checkpoint write.

        Without this, a diverged run keeps training blind and — worse — its
        periodic/epoch-boundary saves OVERWRITE the 'latest' resumable
        checkpoint with non-finite state, destroying the only recovery point
        (observed at archive scale, round 4). The loss is replicated, so every
        host raises together (no pod desync); best_params stays protected
        anyway (NaN never compares < best), and 'latest' still holds the last
        finite state."""
        import math

        if not math.isfinite(loss):
            raise RuntimeError(
                f"non-finite training loss ({loss}) at epoch {self.epoch} "
                f"macro step {steps}: aborting before any further checkpoint "
                "write. 'latest' still holds the last finite state; resume "
                "from it (or 'best') after diagnosing — common causes are "
                "lr/accumulation misconfiguration or corrupt input data."
            )

    def _save_latest(self, step_in_epoch: int = 0) -> None:
        """Resumable 'latest' checkpoint. step_in_epoch=0 means the epoch is
        COMPLETE (resume starts at epoch+1, the historical semantics); k>0
        means k macro steps of self.epoch are already applied (resume re-enters
        the same epoch at batch k via BatchLoader.iter_from)."""
        self.ckpt.save_state(
            self.state,
            {
                "epoch": self.epoch,
                "step_in_epoch": step_in_epoch,
                "best_val_loss": self.best_val_loss,
                "patience_counter": self.patience_counter,
                "config": json.loads(self.cfg.to_json()),
                # a mid-epoch position is only meaningful under the same data
                # sharding — checked by _check_resume_geometry on resume
                "process_count": jax.process_count(),
            },
            "latest",
        )

    def _check_resume_geometry(self, meta: dict[str, Any]) -> None:
        """Refuse a mid-epoch resume under a different batch geometry.

        step_in_epoch counts MACRO steps of a specific (batch_size,
        accumulation_steps, train_stride, seed, process_count) tuple: the
        epoch's window order and the windows-per-step are pure functions of
        those. Skipping `step_in_epoch` batches of a DIFFERENT size would
        silently skip or double-train windows with no error anywhere else."""
        saved = meta.get("config", {}).get("train", {})
        cur = json.loads(self.cfg.to_json())["train"]
        diffs = {
            k: (saved[k], cur[k])
            for k in ("batch_size", "accumulation_steps", "train_stride", "seed")
            if k in saved and saved[k] != cur[k]
        }
        saved_pc = meta.get("process_count")
        if saved_pc is not None and saved_pc != jax.process_count():
            diffs["process_count"] = (saved_pc, jax.process_count())
        if diffs:
            detail = ", ".join(
                f"{k}: saved {a} vs current {b}" for k, (a, b) in diffs.items()
            )
            raise RuntimeError(
                "mid-epoch resume with a different batch geometry would "
                f"silently skip or double-train windows ({detail}). Resume "
                "with the checkpoint's original settings (its config.json / "
                "latest.meta.json records them), or restart from the last "
                "epoch-boundary checkpoint."
            )

    # ------------------------------------------------------------------

    def fit(self, resume: bool = False) -> list[dict[str, Any]]:
        cfg = self.cfg
        # graceful shutdown: SIGTERM/SIGINT finish the current MACRO STEP
        # (single-process; current epoch on multi-process pods — the host-local
        # flags are all-reduced at the epoch boundary via _sync_stop_flag so a
        # signal delivered to one host stops every host together), checkpoint
        # resumable, and exit (the reference has no failure handling beyond
        # try/finally destroy_process_group, SURVEY §5)
        import signal

        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            logger.warning("signal %s received: will checkpoint and stop", signum)
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # not the main thread
                pass

        try:
            return self._fit_loop(resume, stop_requested)
        finally:
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)

    def _fit_loop(
        self, resume: bool, stop_requested: dict[str, bool]
    ) -> list[dict[str, Any]]:
        cfg = self.cfg
        start_step = 0
        if resume and self.ckpt.has_checkpoint("latest"):
            self.state, meta = self.ckpt.restore_state(self.state, "latest")
            start_step = meta.get("step_in_epoch", 0)
            if start_step:
                self._check_resume_geometry(meta)
            self.epoch = meta["epoch"] + (0 if start_step else 1)
            self.best_val_loss = meta["best_val_loss"]
            self.patience_counter = meta["patience_counter"]
            if start_step:
                logger.info(
                    "Resumed mid-epoch: epoch %d at macro step %d (best val %.6f)",
                    self.epoch, start_step, self.best_val_loss,
                )
            else:
                logger.info(
                    "Resumed from epoch %d (best val %.6f)",
                    self.epoch, self.best_val_loss,
                )

        is_main = jax.process_index() == 0
        for epoch in range(self.epoch, cfg.train.epochs):
            self.epoch = epoch
            train_stats = self.train_epoch(start_step, stop_requested)
            start_step = 0  # only the resumed epoch starts mid-way
            interrupted = train_stats.pop("interrupted")
            if interrupted:
                # mid-epoch stop: checkpoint WITH the intra-epoch position and
                # exit resumable; no validation on a partial epoch
                self._save_latest(step_in_epoch=train_stats["steps_in_epoch"])
                if is_main:
                    logger.warning(
                        "stopping mid-epoch %d after %d step(s) on signal "
                        "(resumable)", epoch, train_stats["steps_in_epoch"],
                    )
                break
            record: dict[str, Any] = {"epoch": epoch, **train_stats}

            if self.val_loader is not None:
                val_loss, val_metrics = self.validate()
                record["val_loss"] = val_loss
                record.update(
                    {k: val_metrics[k] for k in
                     ("mae_avg", "rmse_avg", "r2_score_avg", "pearson_r_avg")}
                )
                if is_main:
                    logger.info(
                        "epoch %d | train %.4f | val %.4f | %.1f win/s",
                        epoch, train_stats["train_loss"], val_loss,
                        train_stats["windows_per_sec"],
                    )
                    detailed = (epoch + 1) % cfg.train.log_every_epochs == 0 or (
                        epoch == cfg.train.epochs - 1
                    )
                    if detailed:
                        logger.info(
                            "MAE %.6f RMSE %.6f R2 %.6f r %.6f | by-horizon MAE %s",
                            val_metrics["mae_avg"], val_metrics["rmse_avg"],
                            val_metrics["r2_score_avg"], val_metrics["pearson_r_avg"],
                            [round(m, 4) for m in val_metrics["mae_by_horizon"]],
                        )

                improved = val_loss < self.best_val_loss - cfg.train.min_delta
                if improved:
                    self.best_val_loss = val_loss
                    self.patience_counter = 0
                    # all hosts enter (collective save); metadata/logging primary-only.
                    # eval_params = the EMA weights when tracked (what validate
                    # just scored — the saved best must be the model that won)
                    self.ckpt.save_params(self.state.eval_params, "best")
                    if is_main:
                        logger.info("new best model (val %.6f)", val_loss)
                else:
                    self.patience_counter += 1

            # val_loss is identical on every host (computed from global arrays), so
            # best/patience stay in lockstep and all hosts enter the collective save
            self._save_latest(step_in_epoch=0)
            if is_main:
                self.history.append(record)
                with open(self._history_path, "a") as f:
                    f.write(json.dumps(record) + "\n")

            if self.patience_counter >= cfg.train.patience:
                logger.info("early stopping at epoch %d", epoch + 1)
                break
            # every host reaches this point in lockstep (the breaks above are
            # driven by globally-identical values), so the flag sync is safe
            if _sync_stop_flag(stop_requested["flag"]):
                logger.warning("stopping after epoch %d on signal (resumable)", epoch)
                break
        return self.history

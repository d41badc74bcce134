"""Checkpointing: full train-state save/resume via orbax, plus best-model tracking.

The reference only ever saves rank-0 model weights on val-loss improvement, with no
optimizer/scheduler/epoch state and no resume path (SURVEY.md §5). Here:
  * `best/` holds the best-validation full state (weights enough for eval);
  * `latest/` rotates full train state + trainer metadata for resume;
  * `find_latest_checkpoint` resolves "latest" like the reference's mtime glob
    (test.py:73-89).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from tec_mollm_tpu.training.train_state import TrainState


def _to_saveable(state: TrainState) -> dict[str, Any]:
    return {
        "step": state.step,
        "trainable": state.trainable,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }


def _from_saveable(tree: dict[str, Any], rng_like: jax.Array) -> TrainState:
    return TrainState(
        step=tree["step"],
        trainable=tree["trainable"],
        frozen=tree["frozen"],
        opt_state=tree["opt_state"],
        # wrap with the template's PRNG impl (rbg vs threefry key_data differ)
        rng=jax.random.wrap_key_data(tree["rng"], impl=jax.random.key_impl(rng_like)),
    )


class CheckpointManager:
    """Save/restore train state under <workdir>/checkpoints/<run_name>/."""

    def __init__(self, workdir: str, run_name: str):
        self.dir = os.path.abspath(os.path.join(workdir, "checkpoints", run_name))
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ---- full state (resume) ----

    def save_state(self, state: TrainState, meta: dict[str, Any], name: str = "latest") -> str:
        path = os.path.join(self.dir, name)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        self._ckptr.save(tmp, _to_saveable(jax.device_get(state)))
        self._ckptr.wait_until_finished()
        with open(tmp + ".meta.json", "w") as f:
            json.dump(meta, f)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
            if os.path.exists(path + ".meta.json"):
                os.remove(path + ".meta.json")
        os.rename(tmp, path)
        os.rename(tmp + ".meta.json", path + ".meta.json")
        return path

    def restore_state(self, template: TrainState, name: str = "latest") -> tuple[TrainState, dict[str, Any]]:
        path = os.path.join(self.dir, name)
        restored = self._ckptr.restore(path, _to_saveable(template))
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        return _from_saveable(restored, template.rng), meta

    def has_checkpoint(self, name: str = "latest") -> bool:
        return os.path.exists(os.path.join(self.dir, name))

    # ---- weights only (best model / eval) ----

    def save_params(self, params: Any, name: str = "best") -> str:
        path = os.path.join(self.dir, name + "_params")
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(params))
        self._ckptr.wait_until_finished()
        return path

    def restore_params(self, template: Any, name: str = "best") -> Any:
        path = os.path.join(self.dir, name + "_params")
        return self._ckptr.restore(path, jax.device_get(template))


def find_latest_checkpoint(checkpoint_root: str, kind: str = "best_params") -> str:
    """Most-recently-modified '<run>/best_params' under checkpoint_root
    (reference test.py:73-89 globs best_model_*.pth by mtime)."""
    candidates = []
    for run in os.listdir(checkpoint_root):
        path = os.path.join(checkpoint_root, run, kind)
        if os.path.isdir(path):
            candidates.append(path)
    if not candidates:
        raise FileNotFoundError(f"No '{kind}' checkpoints under {checkpoint_root}")
    return max(candidates, key=os.path.getmtime)

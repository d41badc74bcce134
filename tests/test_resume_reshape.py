"""Epoch-boundary resume across a CHANGED mesh geometry (VERDICT r4 next #7).

Mid-epoch resume under a different batch geometry is refused by design
(trainer._check_resume_geometry; tests/test_midepoch_resume.py). Epoch-boundary
checkpoints carry no intra-epoch position, so they must restore onto ANY mesh
factorization: orbax restores into the new Trainer's sharding-annotated
template, which reshards the arrays — pure layout, not math. Pinned here:
restored params are bit-identical across reshapes, and training continues.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.data.synthetic import grid_coordinates, synthetic_processed_split
from tec_mollm_tpu.graph import build_graph
from tec_mollm_tpu.parallel.mesh import make_mesh
from tec_mollm_tpu.training.trainer import Trainer


def _cfg(epochs: int, model_parallel: int, flatten_optimizer: bool | None = None):
    cfg = tiny_config()
    kw = dict(epochs=epochs, model_parallel=model_parallel, bf16=False)
    if flatten_optimizer is not None:
        kw["flatten_optimizer"] = flatten_optimizer
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, **kw)
    )


@pytest.fixture(scope="module")
def arena():
    cfg = tiny_config()
    train = synthetic_processed_split(
        num_windows=12, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=cfg.model.num_nodes, seed=0,
    )
    val = synthetic_processed_split(
        num_windows=6, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=cfg.model.num_nodes, seed=1,
    )
    train_ds = SlidingWindowDataset(train, cfg.train.L_in, cfg.train.L_out)
    val_ds = SlidingWindowDataset(val, cfg.train.L_in, cfg.train.L_out)
    lat, lon = grid_coordinates(cfg.model.grid_h, cfg.model.grid_w)
    graph = build_graph(lat, lon)
    return train_ds, val_ds, graph


@pytest.mark.slow
class TestResumeAcrossReshape:
    @pytest.mark.parametrize(
        "dp2,tp2", [(4, 1), (2, 4)], ids=["to_dp4", "to_dp2xtp4"]
    )
    def test_epoch_boundary_resume_onto_new_mesh(self, arena, tmp_path, dp2, tp2):
        train_ds, val_ds, graph = arena
        workdir = str(tmp_path)

        # epoch 0 on dp2 x tp2 (4 devices)
        mesh1 = make_mesh(
            data_parallel=2, model_parallel=2, devices=jax.devices()[:4]
        )
        t1 = Trainer(
            _cfg(1, 2), train_ds, val_ds, graph, None,
            workdir=workdir, run_name="reshape", mesh=mesh1,
        )
        h1 = t1.fit()
        assert len(h1) == 1 and np.isfinite(h1[0]["val_loss"])
        saved = jax.device_get(t1.state.trainable)

        # restore onto the NEW mesh: layout-only — params bit-identical.
        # One structural coupling to the mesh exists: flatten_optimizer is
        # auto-disabled under tp>1 (training/optimizer.py — flattening
        # TP-sharded leaves would gather them), so a tp>1 checkpoint restored
        # onto tp==1 must keep flatten_optimizer=False to match the saved
        # moment layout (the refusal without it is asserted below).
        mesh2 = make_mesh(
            data_parallel=dp2, model_parallel=tp2,
            devices=jax.devices()[: dp2 * tp2],
        )
        cfg2 = _cfg(2, tp2, flatten_optimizer=False if tp2 == 1 else None)
        t2 = Trainer(
            cfg2, train_ds, val_ds, graph, None,
            workdir=workdir, run_name="reshape", mesh=mesh2,
        )
        restored_state, meta = t2.ckpt.restore_state(t2.state, "latest")
        assert meta["epoch"] == 0 and meta.get("step_in_epoch", 0) == 0
        got = jax.device_get(restored_state.trainable)
        for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # ... and the full resume path trains the second epoch on the new mesh
        h2 = t2.fit(resume=True)
        assert len(h2) == 1 and h2[0]["epoch"] == 1
        assert np.isfinite(h2[0]["train_loss"]) and np.isfinite(h2[0]["val_loss"])
        if tp2 > 1:
            ca = t2.state.frozen["llm"]["h_0"]["attn"]["c_attn"]["kernel"]
            assert not ca.sharding.is_fully_replicated
        assert os.path.isdir(
            os.path.join(workdir, "checkpoints", "reshape", "latest")
        )

    def test_layout_mismatch_refused_with_actionable_error(self, arena, tmp_path):
        """tp>1 checkpoints carry UNFLATTENED optimizer moments; restoring
        onto a tp==1 config with the default flattened layout must fail with
        the message that names the flatten_optimizer escape hatch (the
        supported path is tested above)."""
        train_ds, val_ds, graph = arena
        workdir = str(tmp_path)
        mesh1 = make_mesh(
            data_parallel=2, model_parallel=2, devices=jax.devices()[:4]
        )
        t1 = Trainer(
            _cfg(1, 2), train_ds, val_ds, graph, None,
            workdir=workdir, run_name="reshape2", mesh=mesh1,
        )
        t1.fit()
        mesh2 = make_mesh(
            data_parallel=4, model_parallel=1, devices=jax.devices()[:4]
        )
        t2 = Trainer(
            _cfg(2, 1), train_ds, val_ds, graph, None,
            workdir=workdir, run_name="reshape2", mesh=mesh2,
        )
        with pytest.raises(RuntimeError, match="flatten_optimizer"):
            t2.ckpt.restore_state(t2.state, "latest")

"""Always-on mid-size dp4 x tp2 Trainer regression (VERDICT r4 weak #4/next #6).

The REAL flagship-multichip regression (tests/test_scaleup_pod.py: 6 layers,
L_in=336, T=21 einsum attention) is gated behind RUN_POD_TESTS because its
XLA:CPU compile is ~1 h on the 1-core rig. This is the always-on middle rung:
the same sharded-Trainer invariants (non-replicated c_attn under tp, exact
padded-remainder update count, finite losses through fit + streaming
validation) at a shape that compiles in minutes — L_in=96 -> 24 latent -> 6
tokens, 2 LLM layers, B=1 x accum 4, dp4 x tp2 on the 8-virtual-device CPU
mesh. Catches dp x tp regressions between the occasional gated runs.
"""

import dataclasses

import numpy as np
import pytest

from tec_mollm_tpu.config import scale_up_config
from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.data.synthetic import grid_coordinates, synthetic_processed_split
from tec_mollm_tpu.graph import build_graph


@pytest.mark.slow
class TestMidSizePod:
    def test_midsize_dp4_tp2_trainer(self, tmp_path):
        cfg = scale_up_config()
        # scale_up lineage (B=1, accum, lr, remat-off policy) at the mid
        # shape: L_in=96 / strides [2,2] -> 24 latent -> 6 patches of 4
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                num_nodes=24, grid_h=4, grid_w=6,
                llm_layers=2, temporal_seq_len=96,
            ),
            train=dataclasses.replace(
                cfg.train,
                L_in=96, epochs=1, model_parallel=2, val_stride=12,
                accumulation_steps=4,
                # stride 1 so the 21-window arena exceeds one macro batch and
                # forces the padded-remainder second update (scale_up's
                # preset stride 3 would leave only 7 windows)
                train_stride=1,
            ),
        )
        assert cfg.model.num_patches == 6  # unrolled-attention regime

        from tec_mollm_tpu.parallel.mesh import make_mesh
        from tec_mollm_tpu.training.trainer import Trainer

        mesh = make_mesh(data_parallel=4, model_parallel=2)
        macro = cfg.train.accumulation_steps * cfg.train.batch_size * 4  # 16
        train_split = synthetic_processed_split(
            num_windows=macro + 5, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
            num_nodes=cfg.model.num_nodes, seed=0,
        )
        val_split = synthetic_processed_split(
            num_windows=12, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
            num_nodes=cfg.model.num_nodes, seed=1,
        )
        train_ds = SlidingWindowDataset(
            train_split, cfg.train.L_in, cfg.train.L_out,
            stride=cfg.train.train_stride,
        )
        val_ds = SlidingWindowDataset(
            val_split, cfg.train.L_in, cfg.train.L_out,
            stride=cfg.train.val_stride,
        )
        assert len(train_ds) > macro  # forces a padded remainder macro step
        assert len(val_ds) > 0

        lat, lon = grid_coordinates(cfg.model.grid_h, cfg.model.grid_w)
        graph = build_graph(
            lat, lon, distance_threshold_km=cfg.data.distance_threshold_km
        )
        tr = Trainer(
            cfg, train_ds, val_ds, graph, None,
            workdir=str(tmp_path), run_name="midsize_pod", mesh=mesh,
        )
        assert tr.dp == 4 and tr.macro_batch == macro

        hist = tr.fit()
        assert len(hist) == 1
        rec = hist[0]
        # padded-remainder semantics: ceil(windows / macro) optimizer updates
        assert rec["updates"] == -(-len(train_ds) // macro)
        assert np.isfinite(rec["train_loss"])
        assert np.isfinite(rec["val_loss"])
        assert np.isfinite(rec["mae_avg"])

        # tp=2 really sharded the backbone's attention projection
        ca = tr.state.frozen["llm"]["h_0"]["attn"]["c_attn"]["kernel"]
        assert not ca.sharding.is_fully_replicated
        assert int(tr.state.step) == rec["updates"]

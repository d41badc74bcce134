"""Multi-device tests on the virtual 8-CPU-device mesh: DP loss parity vs single
device, tensor-parallel sharding correctness, batch sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.data.synthetic import synthetic_processed_split
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from tec_mollm_tpu.parallel.partitioning import param_pspecs, param_shardings
from tec_mollm_tpu.training.train_state import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup(tiny_graph):
    cfg = tiny_config()
    m = cfg.model
    split = synthetic_processed_split(
        num_windows=40, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=m.num_nodes, seed=3,
    )
    ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
    graph_np = (tiny_graph.neighbors, tiny_graph.neighbor_mask)
    return cfg, ds, graph_np


def _run_steps(cfg, ds, graph_np, mesh, model_parallel, n_steps=2, **model_kwargs):
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, model_parallel=model_parallel)
    )
    model = TECMoLLM(cfg.model, **model_kwargs)
    rep = replicated_sharding(mesh)
    graph = tuple(jax.device_put(jnp.asarray(g), rep) for g in graph_np)
    batch_np = ds.gather_batch(
        np.arange(cfg.train.accumulation_steps * cfg.train.batch_size * 4)
    )
    state, tx, mask = create_train_state(
        model, cfg, jax.random.key(0), batch_np, graph
    )
    state = state.replace(
        trainable=jax.device_put(
            state.trainable,
            param_shardings(state.trainable, mesh, model_parallel, cfg.train.model_axis),
        ),
        frozen=jax.device_put(
            state.frozen,
            param_shardings(state.frozen, mesh, model_parallel, cfg.train.model_axis),
        ),
        opt_state=jax.device_put(state.opt_state, rep),
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
    bs = batch_sharding(mesh, cfg.train.data_axis)
    batch = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), bs), batch_np)
    step_fn = jax.jit(make_train_step(model, cfg, tx))
    losses = []
    for _ in range(n_steps):
        state, metrics = step_fn(state, batch, graph)
        losses.append(float(metrics["loss"]))
    return losses, state


class TestDataParallel:
    def test_dp8_matches_single_device(self, setup):
        cfg, ds, graph_np = setup
        mesh8 = make_mesh(data_parallel=8, model_parallel=1)
        mesh1 = make_mesh(data_parallel=1, model_parallel=1, devices=jax.devices()[:1])
        losses8, _ = _run_steps(cfg, ds, graph_np, mesh8, 1)
        losses1, _ = _run_steps(cfg, ds, graph_np, mesh1, 1)
        np.testing.assert_allclose(losses8, losses1, rtol=2e-4)

    def test_params_stay_replicated_after_update(self, setup):
        cfg, ds, graph_np = setup
        mesh = make_mesh(data_parallel=4, model_parallel=1, devices=jax.devices()[:4])
        _, state = _run_steps(cfg, ds, graph_np, mesh, 1, n_steps=1)
        k = state.params["head"]["fc2"]["kernel"]
        assert k.sharding.is_fully_replicated


class TestTensorParallel:
    def test_dp4_tp2_matches_single_device(self, setup):
        cfg, ds, graph_np = setup
        mesh = make_mesh(data_parallel=4, model_parallel=2)
        mesh1 = make_mesh(data_parallel=1, model_parallel=1, devices=jax.devices()[:1])
        losses_tp, state = _run_steps(cfg, ds, graph_np, mesh, 2)
        losses_1, _ = _run_steps(cfg, ds, graph_np, mesh1, 1)
        np.testing.assert_allclose(losses_tp, losses_1, rtol=2e-4)
        # backbone kernels actually sharded over 'model'
        ca = state.params["llm"]["h_0"]["attn"]["c_attn"]["kernel"]
        assert not ca.sharding.is_fully_replicated
        spec = ca.sharding.spec
        assert spec == P(None, "model")

    def test_pspec_rules(self, setup):
        cfg, ds, graph_np = setup
        model = TECMoLLM(cfg.model)
        m = cfg.model
        x = jnp.zeros((1, m.temporal_seq_len, m.num_nodes, m.in_features))
        tf = jnp.zeros((1, m.temporal_seq_len, 4), jnp.int32)
        params = model.init(
            jax.random.key(0), x, tf,
            jnp.asarray(graph_np[0]), jnp.asarray(graph_np[1]),
        )["params"]
        specs = param_pspecs(params, model_parallel=2)
        assert specs["llm"]["h_0"]["attn"]["c_attn"]["kernel"] == P(None, "model")
        assert specs["llm"]["h_0"]["attn"]["c_proj"]["kernel"] == P("model", None)
        assert specs["llm"]["h_0"]["mlp"]["c_fc"]["kernel"] == P(None, "model")
        assert specs["llm"]["h_0"]["mlp"]["c_proj"]["kernel"] == P("model", None)
        assert specs["head"]["fc1"]["kernel"] == P(None, "model")
        assert specs["head"]["fc2"]["kernel"] == P("model", None)
        # replicated leaves
        assert specs["embedding"]["node"]["embedding"] == P()
        assert specs["llm"]["h_0"]["ln_1"]["scale"] == P()
        # lora_B of c_attn follows the column-parallel split
        assert specs["llm"]["h_0"]["attn"]["c_attn"]["lora_B"] == P(None, "model")

    def test_indivisible_dims_fall_back_to_replicated(self, setup):
        cfg, *_ = setup
        params = {"llm": {"h_0": {"attn": {"c_attn": {"kernel": jnp.zeros((4, 9))}}}}}
        specs = param_pspecs(params, model_parallel=2)
        assert specs["llm"]["h_0"]["attn"]["c_attn"]["kernel"] == P()


class TestScaleUpStructure:
    @pytest.mark.slow
    def test_dp4_tp2_scale_up_shaped_step(self):
        """The scale-up preset REQUIRES multiple chips (B>=4 OOMs a single v5e,
        BASELINE.md), so its structural path must work sharded: a long-L_in
        config producing T=5 > UNROLL_MAX_SEQ tokens (the einsum attention
        branch, not the unrolled one) with remat_llm on, stepped under dp4xtp2
        and matching the single-device loss."""
        cfg = tiny_config(L_in=80, L_out=4, llm_layers=1)
        # force the einsum branch at T=5 via the threshold knob (the default
        # threshold is 8 since the T=6 unroll A/B; the scale-up preset's T=21
        # uses the einsum branch exercised here)
        unroll_max = 4
        assert cfg.model.num_patches > unroll_max
        split = synthetic_processed_split(
            num_windows=20, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
            num_nodes=cfg.model.num_nodes, seed=5,
        )
        ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
        from tec_mollm_tpu.data.synthetic import grid_coordinates
        from tec_mollm_tpu.graph import build_graph

        lat, lon = grid_coordinates(cfg.model.grid_h, cfg.model.grid_w)
        g = build_graph(lat, lon)
        graph_np = (g.neighbors, g.neighbor_mask)

        mesh = make_mesh(data_parallel=4, model_parallel=2)
        mesh1 = make_mesh(data_parallel=1, model_parallel=1, devices=jax.devices()[:1])
        losses_tp, state = _run_steps(
            cfg, ds, graph_np, mesh, 2, n_steps=1, remat_llm=True,
            unroll_max_seq=unroll_max,
        )
        losses_1, _ = _run_steps(
            cfg, ds, graph_np, mesh1, 1, n_steps=1, remat_llm=True,
            unroll_max_seq=unroll_max,
        )
        np.testing.assert_allclose(losses_tp, losses_1, rtol=2e-4)
        assert all(np.isfinite(losses_tp))
        ca = state.params["llm"]["h_0"]["attn"]["c_attn"]["kernel"]
        assert ca.sharding.spec == P(None, "model")


class TestMeshUtils:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh(data_parallel=2, model_parallel=2)
        assert mesh.shape == {"data": 2, "model": 2}

    def test_batch_padding(self):
        from tec_mollm_tpu.parallel.mesh import pad_batch_to_multiple

        batch = {"x": np.ones((5, 3)), "y": np.zeros((5, 2))}
        out = pad_batch_to_multiple(batch, 4)
        assert out["x"].shape == (8, 3)
        assert out["valid"].tolist() == [True] * 5 + [False] * 3


class TestDataParallelEval:
    """VERDICT r2 #4: the eval harness must scale over the mesh like the
    Trainer's validate path — metrics computed on 8 devices must match a
    single-device run."""

    def _params(self, cfg, ds, graph_np):
        model = TECMoLLM(cfg.model)
        batch = ds.gather_batch(np.arange(2))
        return model.init(
            jax.random.key(5),
            jnp.asarray(batch["x"]),
            jnp.asarray(batch["time_features"]),
            jnp.asarray(graph_np[0]),
            jnp.asarray(graph_np[1]),
        )["params"]

    def test_streaming_eval_8dev_matches_1dev(self, setup, tiny_graph):
        from tec_mollm_tpu.data.scaler import StandardScaler
        from tec_mollm_tpu.evaluation.harness import evaluate_model_streaming

        cfg, ds, graph_np = setup
        params = self._params(cfg, ds, graph_np)
        scaler = StandardScaler()
        scaler.mean_ = np.array([40.0])
        scaler.scale_ = np.array([15.0])

        # batch 6 does not divide 8: exercises the round-up path too
        m8 = evaluate_model_streaming(cfg, params, ds, tiny_graph, scaler, batch_size=6)
        m1 = evaluate_model_streaming(
            cfg, params, ds, tiny_graph, scaler, batch_size=6,
            devices=jax.devices()[:1],
        )
        for key in ("mae_avg", "rmse_avg", "r2_score_avg", "pearson_r_avg"):
            # abs term: pearson/r2 of a random-init model sit near 0 where
            # cross-device reduction-order noise dominates the relative scale
            # (fp32 partial sums land in a different order on 8 vs 1 devices;
            # observed deviation up to ~2e-6 on pearson_r at |r|~3e-3)
            assert m8[key] == pytest.approx(m1[key], rel=1e-5, abs=1e-5), key
        np.testing.assert_allclose(
            m8["mae_by_horizon"], m1["mae_by_horizon"], rtol=1e-5
        )

    def test_eval_batches_are_sharded(self, setup, tiny_graph):
        """The eval step must actually see batch-dim-sharded inputs (not one
        device doing all the work)."""
        from tec_mollm_tpu.evaluation.harness import EvalExecutor

        cfg, ds, graph_np = setup
        params = self._params(cfg, ds, graph_np)
        ex = EvalExecutor(cfg, tiny_graph, params, batch_size=8)
        assert ex.dp == 8 and ex.batch_size == 8
        batch = ds.gather_batch(np.arange(8))
        batch["valid"] = np.ones(8, dtype=bool)
        dev = ex.put(batch)
        assert len(dev["x"].sharding.device_set) == 8
        shard_shapes = {s.data.shape[0] for s in dev["x"].addressable_shards}
        assert shard_shapes == {1}  # 8-way batch split

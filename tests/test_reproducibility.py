"""Determinism guarantees: same seed -> identical training trajectory; prefetch
thread errors surface to the consumer."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.dataset import BatchLoader, SlidingWindowDataset
from tec_mollm_tpu.data.synthetic import synthetic_processed_split
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.training.train_state import create_train_state, make_train_step


class TestSeededTraining:
    def test_same_seed_same_trajectory(self, tiny_graph):
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, accumulation_steps=2, batch_size=2)
        )
        m = cfg.model
        split = synthetic_processed_split(12, cfg.train.L_in, cfg.train.L_out,
                                          m.num_nodes, seed=5)
        ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out)
        graph = (jnp.asarray(tiny_graph.neighbors), jnp.asarray(tiny_graph.neighbor_mask))
        batch = jax.tree.map(jnp.asarray, ds.gather_batch(np.arange(4)))

        def run(seed):
            model = TECMoLLM(m)
            state, tx, _ = create_train_state(
                model, cfg, jax.random.key(seed, impl=cfg.train.prng_impl),
                ds.gather_batch(np.arange(4)), graph,
            )
            step = jax.jit(make_train_step(model, cfg, tx))
            losses = []
            for _ in range(3):
                state, metrics = step(state, batch, graph)
                losses.append(float(metrics["loss"]))
            return losses, np.asarray(state.trainable["head"]["fc2"]["kernel"])

        l1, k1 = run(0)
        l2, k2 = run(0)
        l3, _ = run(1)
        assert l1 == l2
        np.testing.assert_array_equal(k1, k2)
        assert l1 != l3  # different seed -> different dropout/init


class TestPrefetchErrors:
    def test_producer_exception_propagates(self):
        split = synthetic_processed_split(10, 4, 2, 6)
        ds = SlidingWindowDataset(split, 4, 2)

        class Broken(BatchLoader):
            def _batches(self, start_step: int = 0):
                yield ds.gather_batch(np.array([0]))
                raise RuntimeError("producer boom")

        loader = Broken(ds, batch_size=1, prefetch=2)
        with pytest.raises(RuntimeError, match="producer boom"):
            list(loader)

"""End-to-end model forward tests on the tiny config (CPU-runnable, SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.models import TECMoLLM


@pytest.fixture(scope="module")
def setup(tiny_graph):
    cfg = tiny_config()
    m = cfg.model
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, m.temporal_seq_len, m.num_nodes, m.in_features)).astype(np.float32))
    tf = jnp.asarray(rng.integers(0, 4, size=(b, m.temporal_seq_len, 4)).astype(np.int32))
    nbrs = jnp.asarray(tiny_graph.neighbors)
    mask = jnp.asarray(tiny_graph.neighbor_mask)
    model = TECMoLLM(m)
    params = model.init(jax.random.key(0), x, tf, nbrs, mask)
    return cfg, model, params, (x, tf, nbrs, mask)


class TestForward:
    def test_output_shape_and_dtype(self, setup):
        cfg, model, params, args = setup
        out = model.apply(params, *args)
        b = args[0].shape[0]
        assert out.shape == (b, cfg.model.prediction_horizon, cfg.model.num_nodes, 1)
        assert out.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(out)))

    def test_jit_compiles_once(self, setup):
        cfg, model, params, args = setup
        fwd = jax.jit(model.apply)
        out1 = fwd(params, *args)
        out2 = fwd(params, *args)
        np.testing.assert_array_equal(out1, out2)

    def test_deterministic_flag(self, setup):
        """dropout active only when deterministic=False (reference applies 4 dropouts:
        GAT alpha, LoRA input, GPT-2 internals, post-LLM + head)."""
        cfg, model, params, args = setup
        out_det = model.apply(params, *args, deterministic=True)
        out_train = model.apply(
            params, *args, deterministic=False, rngs={"dropout": jax.random.key(1)}
        )
        out_train2 = model.apply(
            params, *args, deterministic=False, rngs={"dropout": jax.random.key(2)}
        )
        assert not np.allclose(out_det, out_train)
        assert not np.allclose(out_train, out_train2)

    def test_batch_independence(self, setup):
        """sample b's output depends only on sample b's input."""
        cfg, model, params, (x, tf, nbrs, mask) = setup
        out = model.apply(params, x, tf, nbrs, mask)
        x2 = x.at[1].set(x[1] * 2.0 + 1.0)
        out2 = model.apply(params, x2, tf, nbrs, mask)
        np.testing.assert_allclose(out[0], out2[0], atol=1e-5)
        assert not np.allclose(out[1], out2[1])

    def test_pad_nodes_equals_unpadded(self, setup, tiny_graph):
        """pad_nodes_to (DESIGN §20 lane-padding experiment) must not change
        any real node's output, in both graph modes, on the SAME params."""
        from tec_mollm_tpu.models.tec_mollm import graph_inputs

        cfg, model, params, (x, tf, nbrs, mask) = setup
        want = np.asarray(model.apply(params, x, tf, nbrs, mask))
        # 48 nodes -> pad to 52: genuinely ragged against the multiple
        padded = TECMoLLM(cfg.model, pad_nodes_to=13)
        got = np.asarray(padded.apply(params, x, tf, nbrs, mask))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

        shifts, (g1, g2) = graph_inputs(tiny_graph)
        if shifts is not None:
            base_s = TECMoLLM(cfg.model, stencil_shifts=shifts, gat_pallas=False)
            pad_s = TECMoLLM(
                cfg.model, stencil_shifts=shifts, gat_pallas=False,
                pad_nodes_to=13,
            )
            np.testing.assert_allclose(
                np.asarray(pad_s.apply(params, x, tf, g1, g2)),
                np.asarray(base_s.apply(params, x, tf, g1, g2)),
                atol=1e-5,
            )

    def test_pad_nodes_training_gradients_finite(self, setup, tiny_graph):
        """Regression (round 4): padded nodes have ZERO valid stencil offsets,
        so the stencil softmax denominator is 0 — the forward NaN is sliced
        away at the output but the backward poisons EVERY gradient with
        0 * NaN (caught by the first padded archive-scale training run; tiny
        training tests never saw it because grids < pad_nodes_to skip
        padding). The denom floor must keep gradients finite."""
        from tec_mollm_tpu.models.tec_mollm import graph_inputs

        cfg, model, params, (x, tf, _, _) = setup
        shifts, (g1, g2) = graph_inputs(tiny_graph)
        if shifts is None:
            pytest.skip("tiny graph has no stencil form")
        padded = TECMoLLM(
            cfg.model, stencil_shifts=shifts, gat_pallas=False, pad_nodes_to=13
        )

        def loss(p):
            preds = padded.apply(
                p, x, tf, g1, g2,
                deterministic=False, rngs={"dropout": jax.random.key(0)},
            )
            return jnp.mean(preds**2)

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        finite = jax.tree.map(
            lambda g: bool(np.all(np.isfinite(np.asarray(g)))), grads
        )
        bad = [k for k, v in jax.tree_util.tree_leaves_with_path(finite) if not v]
        assert not bad, f"non-finite gradients in {bad[:5]}"

    def test_im2col_forward_matches_default(self, setup):
        """Full-model im2col conv lowering: same params, same outputs."""
        cfg, model, params, args = setup
        want = np.asarray(model.apply(params, *args))
        got = np.asarray(
            TECMoLLM(cfg.model, im2col_conv=True).apply(params, *args)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bf16_forward(self, setup):
        cfg, model, params, args = setup
        model_bf16 = TECMoLLM(cfg.model, dtype=jnp.bfloat16)
        out = model_bf16.apply(params, *args)
        assert out.dtype == jnp.float32  # predictions cast back to fp32
        out_f32 = model.apply(params, *args)
        # bf16 compute tracks fp32 within bf16 tolerance
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_f32), atol=0.15)

    def test_remat_matches(self, setup):
        cfg, model, params, args = setup
        model_remat = TECMoLLM(cfg.model, remat_llm=True)
        out = np.asarray(model_remat.apply(params, *args))
        expect = np.asarray(model.apply(params, *args))
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_param_count_default_config(self):
        """Full-size config param budget sanity: 3-layer GPT-2 (~21M) + adapters +
        embeddings; catches silent architecture drift."""
        from tec_mollm_tpu.config import Config

        cfg = Config().resolved()
        m = cfg.model
        model = TECMoLLM(m)
        x = jnp.zeros((1, m.temporal_seq_len, m.num_nodes, m.in_features))
        tf = jnp.zeros((1, m.temporal_seq_len, 4), dtype=jnp.int32)
        nbrs = jnp.zeros((m.num_nodes, 11), dtype=jnp.int32)
        mask = jnp.ones((m.num_nodes, 11), dtype=bool)
        params = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x, tf, nbrs, mask)
        )
        total = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
        # GPT-2 3 blocks ~21.3M + wpe 0.79M + head ~1.33M + temporal ~0.5M +
        # embeddings ~57k + GAT ~1k + LoRA ~0.15M  => ~24M
        assert 20e6 < total < 30e6, f"unexpected param count {total}"


class TestRevIN:
    """Opt-in per-window instance normalization (ModelConfig.revin)."""

    def test_equals_manual_composition(self, setup):
        """revin model == normalize -> plain model -> denormalize, with the
        SAME params (RevIN adds none, so checkpoints interchange)."""
        import dataclasses

        cfg, model, params, (x, tf, nbrs, mask) = setup
        m_rev = TECMoLLM(dataclasses.replace(cfg.model, revin=True))
        out_rev = m_rev.apply(params, x, tf, nbrs, mask)

        x0 = np.asarray(x[..., 0])
        mu = x0.mean(axis=1, keepdims=True)
        sd = np.sqrt(x0.var(axis=1, keepdims=True) + 1e-5)
        x_norm = np.concatenate(
            [((x0 - mu) / sd)[..., None], np.asarray(x[..., 1:])], axis=-1
        )
        out_plain = model.apply(params, jnp.asarray(x_norm), tf, nbrs, mask)
        manual = np.asarray(out_plain) * sd[..., None] + mu[..., None]
        np.testing.assert_allclose(np.asarray(out_rev), manual, atol=1e-5)

    def test_zero_head_predicts_window_mean(self, setup):
        """With the head's output layer zeroed, the RevIN model predicts exactly
        the input window's per-node TEC mean at every horizon — i.e. training
        starts AT the Historical-Average baseline."""
        import dataclasses

        cfg, model, params, (x, tf, nbrs, mask) = setup
        zeroed = jax.tree_util.tree_map_with_path(
            lambda path, p: jnp.zeros_like(p)
            if any(getattr(k, "key", None) == "fc2" for k in path)
            else p,
            params,
        )
        m_rev = TECMoLLM(dataclasses.replace(cfg.model, revin=True))
        out = np.asarray(m_rev.apply(zeroed, x, tf, nbrs, mask))
        ha = np.asarray(x[..., 0]).mean(axis=1)  # (B, N)
        expect = np.broadcast_to(
            ha[:, None, :, None], out.shape
        )
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_gradients_flow(self, setup):
        """RevIN's mu/sd are differentiable pass-throughs; the loss still
        produces finite, nonzero grads."""
        import dataclasses

        cfg, model, params, (x, tf, nbrs, mask) = setup
        m_rev = TECMoLLM(dataclasses.replace(cfg.model, revin=True))

        def loss(p):
            out = m_rev.apply(p, x, tf, nbrs, mask)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)

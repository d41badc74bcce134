"""The compat torch_geometric GATv2Conv shim == our JAX GATv2, weight-for-weight.

The shim (compat/torch_geometric) exists so the actual PyTorch reference
(/root/reference/train.py) can train in this environment (the real PyG wheel is
absent); checkpoints it produces flow through models/ref_import.py. These tests
pin the shim to the exact semantics our GATv2 implements (and which
tests/test_modules.py already pinned against a numpy golden), so the
reference-in-env training run exercises the same math as the real PyG layer.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "compat"))

import jax.numpy as jnp  # noqa: E402

from tec_mollm_tpu.graph.builder import build_padded_neighbors  # noqa: E402
from tec_mollm_tpu.models.gat import GATv2  # noqa: E402


def _random_graph(rng, n: int, p: float = 0.15):
    adj = rng.random((n, n)) < p
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    src, dst = np.nonzero(adj)
    return np.stack([src, dst]).astype(np.int64)


def _shim_conv(f_in=22, out=11, heads=2, seed=3):
    from torch_geometric.nn import GATv2Conv

    torch.manual_seed(seed)
    return GATv2Conv(
        f_in, out, heads=heads, dropout=0.1, concat=True, add_self_loops=True
    )


def _jax_params(conv, heads, out):
    def lin(mod):
        return {
            "kernel": mod.weight.detach().numpy().T.copy(),
            "bias": mod.bias.detach().numpy().copy(),
        }

    return {
        "lin_l": lin(conv.lin_l),
        "lin_r": lin(conv.lin_r),
        "att": conv.att.detach().numpy().reshape(1, heads * out).copy(),
        "bias": conv.bias.detach().numpy().copy(),
    }


class TestShimMatchesJax:
    def test_eval_forward_matches(self):
        rng = np.random.default_rng(0)
        n, f_in, heads, out = 30, 22, 2, 11
        edge_index = _random_graph(rng, n)
        conv = _shim_conv(f_in, out, heads)
        conv.eval()
        x = rng.standard_normal((n, f_in)).astype(np.float32)
        with torch.no_grad():
            y_t = conv(torch.from_numpy(x), torch.from_numpy(edge_index)).numpy()

        neighbors, mask, _ = build_padded_neighbors(
            edge_index.astype(np.int32), np.ones(edge_index.shape[1], np.float32), n
        )
        gat = GATv2(out_channels=out, heads=heads)
        y_j = gat.apply(
            {"params": _jax_params(conv, heads, out)},
            jnp.asarray(x),
            jnp.asarray(neighbors),
            jnp.asarray(mask),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)

    def test_isolated_node_gets_self_loop_only(self):
        # a node with no incident edges must still produce finite output through
        # its injected self loop (PyG add_self_loops contract)
        rng = np.random.default_rng(1)
        n, f_in, heads, out = 8, 6, 2, 3
        # edges only among nodes 0..3; nodes 4..7 isolated
        edge_index = np.array([[0, 1, 2, 3], [1, 0, 3, 2]], dtype=np.int64)
        conv = _shim_conv(f_in, out, heads, seed=5)
        conv.eval()
        x = rng.standard_normal((n, f_in)).astype(np.float32)
        with torch.no_grad():
            y = conv(torch.from_numpy(x), torch.from_numpy(edge_index)).numpy()
        assert np.isfinite(y).all()
        # isolated node output == attention over {self} == lin_l(x_i) + bias
        with torch.no_grad():
            expect = (
                conv.lin_l(torch.from_numpy(x[4:]))
                + conv.bias
            ).numpy()
        np.testing.assert_allclose(y[4:], expect, atol=1e-5)

    def test_training_backward_and_grads_finite(self):
        rng = np.random.default_rng(2)
        n, f_in, heads, out = 20, 10, 2, 5
        edge_index = _random_graph(rng, n, p=0.2)
        conv = _shim_conv(f_in, out, heads, seed=7)
        conv.train()
        x = torch.from_numpy(rng.standard_normal((n, f_in)).astype(np.float32))
        y = conv(x, torch.from_numpy(edge_index))
        loss = (y ** 2).mean()
        loss.backward()
        for name, p in conv.named_parameters():
            assert p.grad is not None, name
            assert torch.isfinite(p.grad).all(), name

    def test_reference_batching_quirk_reproduced(self):
        # SURVEY §2.d.1 executable evidence: the reference flattens stacked
        # graphs to (L*B*N, C) and applies ONE un-offset edge_index
        # (modules.py:353-356), so only the FIRST graph's nodes receive real
        # neighbor messages — every later graph gets self-loop-only attention.
        # The shim must reproduce exactly this when driven the reference's way.
        rng = np.random.default_rng(4)
        n, f_in, heads, out = 6, 5, 2, 3
        edge_index = np.array([[0, 1, 2, 3], [1, 0, 3, 2]], dtype=np.int64)
        conv = _shim_conv(f_in, out, heads, seed=11)
        conv.eval()
        x2 = rng.standard_normal((2 * n, f_in)).astype(np.float32)  # 2 graphs
        with torch.no_grad():
            y = conv(torch.from_numpy(x2), torch.from_numpy(edge_index)).numpy()
            # second graph's rows == pure self-attention == lin_l(x) + bias
            expect = (
                conv.lin_l(torch.from_numpy(x2[n:])) + conv.bias
            ).numpy()
        np.testing.assert_allclose(y[n:], expect, atol=1e-5)
        # ...while the first graph's connected nodes do NOT equal self-only
        with torch.no_grad():
            self_only = (
                conv.lin_l(torch.from_numpy(x2[:4])) + conv.bias
            ).numpy()
        assert np.abs(y[:4] - self_only).max() > 1e-3

    def test_state_dict_contract_for_ref_import(self):
        # the exact keys/shapes models/ref_import.py expects from a reference
        # checkpoint's spatial_encoder.gat_conv.*
        conv = _shim_conv(22, 11, 2)
        sd = conv.state_dict()
        assert sd["lin_l.weight"].shape == (22, 22)
        assert sd["lin_l.bias"].shape == (22,)
        assert sd["lin_r.weight"].shape == (22, 22)
        assert sd["att"].shape == (1, 2, 11)
        assert sd["bias"].shape == (22,)

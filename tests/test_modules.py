"""Per-module shape and value tests for the model components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.models.embeddings import SpatioTemporalEmbedding
from tec_mollm_tpu.models.gat import GATv2, SpatialEncoder
from tec_mollm_tpu.models.head import PredictionHead
from tec_mollm_tpu.models.lora import LoRADense
from tec_mollm_tpu.models.temporal import MultiScaleConvBlock, TemporalEncoder


@pytest.fixture(scope="module")
def cfg():
    return tiny_config().model


class TestEmbedding:
    def test_shapes_and_composition(self, cfg):
        b, l, n = 2, cfg.temporal_seq_len, cfg.num_nodes
        x = jnp.ones((b, l, n, cfg.in_features))
        tf = jnp.zeros((b, l, 4), dtype=jnp.int32)
        mod = SpatioTemporalEmbedding(cfg)
        params = mod.init(jax.random.key(0), x, tf)
        out = mod.apply(params, x, tf)
        assert out.shape == (b, l, n, cfg.in_features + cfg.d_emb)
        # first C_in channels pass through unchanged
        np.testing.assert_array_equal(out[..., : cfg.in_features], x)
        # embedding part = node + tod[0] + doy[0] + year[0] + season[0]
        p = params["params"]
        expect = (
            p["node"]["embedding"]
            + p["tod"]["embedding"][0]
            + p["doy"]["embedding"][0]
            + p["year"]["embedding"][0]
            + p["season"]["embedding"][0]
        )
        np.testing.assert_allclose(
            out[0, 0, :, cfg.in_features :], expect, rtol=1e-6, atol=1e-5
        )

    def test_year_table_zero_init(self, cfg):
        """The year table initializes to ZEROS (deliberate deviation from the
        reference's N(0,1), embeddings.py): the deployment split always reads
        year rows outside the training support (train <=2021, val/test 2022+
        under archive-anchored indexing, data/features.py), and an untrained
        N(0,1) row is pure noise at eval (norm ~4, same as trained rows).
        Unseen years must read the neutral 'no year information' vector."""
        b, l, n = 1, 4, cfg.num_nodes
        x = jnp.zeros((b, l, n, cfg.in_features))
        tf = jnp.zeros((b, l, 4), dtype=jnp.int32)
        mod = SpatioTemporalEmbedding(cfg)
        params = mod.init(jax.random.key(2), x, tf)
        p = params["params"]
        np.testing.assert_array_equal(
            np.asarray(p["year"]["embedding"]), 0.0
        )
        # the other tables keep the reference's N(0,1) init
        for name in ("node", "tod", "doy", "season"):
            assert np.abs(np.asarray(p[name]["embedding"])).max() > 0.1, name
        # at init the output is invariant to the year feature — seen or unseen
        tf_other_year = tf.at[..., 2].set(cfg.num_years - 1)
        out0 = mod.apply(params, x, tf)
        out1 = mod.apply(params, x, tf_other_year)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))

    def test_time_feature_indexing(self, cfg):
        """different timesteps pick different temporal embeddings."""
        b, l, n = 1, 4, cfg.num_nodes
        x = jnp.zeros((b, l, n, cfg.in_features))
        tf = jnp.array([[[0, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]]], dtype=jnp.int32)
        mod = SpatioTemporalEmbedding(cfg)
        params = mod.init(jax.random.key(1), x, tf)
        out = mod.apply(params, x, tf)
        emb = out[0, :, 0, cfg.in_features :]
        assert not np.allclose(emb[0], emb[1])
        assert not np.allclose(emb[0], emb[2])
        assert not np.allclose(emb[0], emb[3])


def gatv2_numpy_reference(x, nbrs, mask, wl, bl, wr, br, att, bias, slope=0.2):
    """Independent dense GATv2 (PyG semantics) in numpy, one graph.

    x (N,F); wl/wr (F, H*C); att (H, C); out (N, H*C).
    out_i = sum_j softmax_j( att . leaky_relu(xl_j + xr_i) ) * xl_j  (j in nbrs incl self)
    """
    n = x.shape[0]
    h, c = att.shape
    xl = (x @ wl + bl).reshape(n, h, c)
    xr = (x @ wr + br).reshape(n, h, c)
    out = np.zeros((n, h, c))
    for i in range(n):
        js = nbrs[i][mask[i]]
        e = xl[js] + xr[i][None]  # (d, h, c)
        e = np.where(e >= 0, e, slope * e)
        scores = (e * att[None]).sum(-1)  # (d, h)
        scores = scores - scores.max(axis=0, keepdims=True)
        alpha = np.exp(scores) / np.exp(scores).sum(axis=0, keepdims=True)
        out[i] = (alpha[..., None] * xl[js]).sum(0)
    return out.reshape(n, h * c) + bias


class TestGATv2:
    def test_matches_numpy_reference(self, cfg, tiny_graph):
        rng = np.random.default_rng(0)
        n = tiny_graph.num_nodes
        f = cfg.spatial_in_channels
        x = rng.normal(size=(n, f)).astype(np.float32)
        mod = GATv2(out_channels=cfg.spatial_out_channels, heads=cfg.spatial_heads)
        params = mod.init(
            jax.random.key(0),
            jnp.asarray(x),
            jnp.asarray(tiny_graph.neighbors),
            jnp.asarray(tiny_graph.neighbor_mask),
        )
        out = mod.apply(
            params,
            jnp.asarray(x),
            jnp.asarray(tiny_graph.neighbors),
            jnp.asarray(tiny_graph.neighbor_mask),
        )
        p = params["params"]
        expect = gatv2_numpy_reference(
            x,
            tiny_graph.neighbors,
            tiny_graph.neighbor_mask,
            np.asarray(p["lin_l"]["kernel"]),
            np.asarray(p["lin_l"]["bias"]),
            np.asarray(p["lin_r"]["kernel"]),
            np.asarray(p["lin_r"]["bias"]),
            np.asarray(p["att"]).reshape(cfg.spatial_heads, cfg.spatial_out_channels),
            np.asarray(p["bias"]),
        )
        np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5)

    def test_batched_consistency(self, cfg, tiny_graph):
        """(B, L, N, F) input must equal per-slice application — the property the
        reference's flattened batching broke (SURVEY.md §2.d.1)."""
        rng = np.random.default_rng(1)
        n, f = tiny_graph.num_nodes, cfg.spatial_in_channels
        x = jnp.asarray(rng.normal(size=(2, 3, n, f)).astype(np.float32))
        nbrs = jnp.asarray(tiny_graph.neighbors)
        mask = jnp.asarray(tiny_graph.neighbor_mask)
        mod = GATv2(out_channels=cfg.spatial_out_channels, heads=cfg.spatial_heads)
        params = mod.init(jax.random.key(0), x, nbrs, mask)
        out = mod.apply(params, x, nbrs, mask)
        assert out.shape == (2, 3, n, cfg.spatial_channels)
        for b in range(2):
            for l in range(3):
                single = mod.apply(params, x[b, l], nbrs, mask)
                np.testing.assert_allclose(out[b, l], single, atol=1e-5)

    def test_residual_encoder(self, cfg, tiny_graph):
        n, f = tiny_graph.num_nodes, cfg.spatial_in_channels
        x = jnp.ones((1, 2, n, f))
        mod = SpatialEncoder(cfg)
        params = mod.init(
            jax.random.key(0), x, jnp.asarray(tiny_graph.neighbors),
            jnp.asarray(tiny_graph.neighbor_mask),
        )
        out = mod.apply(
            params, x, jnp.asarray(tiny_graph.neighbors),
            jnp.asarray(tiny_graph.neighbor_mask),
        )
        assert out.shape == x.shape  # residual requires in == out channels


class TestTemporal:
    def test_conv_block_shapes(self):
        mod = MultiScaleConvBlock(out_channels=8, stride=2)
        x = jnp.ones((4, 16, 6))
        params = mod.init(jax.random.key(0), x)
        out = mod.apply(params, x)
        assert out.shape == (4, 8, 8)

    def test_conv_block_matches_torch(self):
        """Golden test vs torch: Conv1d(k same-pad) + GroupNorm(1) + exact GELU +
        1x1 strided conv (reference modules.py:25-41)."""
        import torch

        rng = np.random.default_rng(0)
        B, L, Cin, Cout, stride = 3, 16, 5, 7, 2
        x = rng.normal(size=(B, L, Cin)).astype(np.float32)

        mod = MultiScaleConvBlock(out_channels=Cout, stride=stride)
        params = mod.init(jax.random.key(0), jnp.asarray(x))

        tconvs = []
        with torch.no_grad():
            for k in (3, 5, 7):
                conv = torch.nn.Conv1d(Cin, Cout, kernel_size=k, padding=(k - 1) // 2)
                gn = torch.nn.GroupNorm(1, Cout)
                # copy OUR params into torch: flax conv kernel (k, Cin, Cout) ->
                # torch (Cout, Cin, k)
                w = np.asarray(params["params"][f"conv_k{k}"]["kernel"])
                conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
                conv.bias.copy_(torch.from_numpy(np.asarray(params["params"][f"conv_k{k}"]["bias"])))
                gn.weight.copy_(torch.from_numpy(np.asarray(params["params"][f"norm_k{k}"]["scale"])))
                gn.bias.copy_(torch.from_numpy(np.asarray(params["params"][f"norm_k{k}"]["bias"])))
                tconvs.append((conv, gn))
            final = torch.nn.Conv1d(3 * Cout, Cout, kernel_size=1, stride=stride)
            wf = np.asarray(params["params"]["final_conv"]["kernel"])
            final.weight.copy_(torch.from_numpy(wf.transpose(2, 1, 0)))
            final.bias.copy_(torch.from_numpy(np.asarray(params["params"]["final_conv"]["bias"])))

            xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, L)
            branches = [
                torch.nn.functional.gelu(gn(conv(xt))) for conv, gn in tconvs
            ]
            expect = final(torch.cat(branches, dim=1)).numpy().transpose(0, 2, 1)

        out = np.asarray(mod.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(out, expect, atol=2e-5)

    def test_fused_equals_unfused(self):
        """Zero-padded-kernel fusion must be exactly the three separate convs."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 16, 6)).astype(np.float32))
        fused = MultiScaleConvBlock(out_channels=8, stride=2, fuse_branches=True)
        params = fused.init(jax.random.key(0), x)
        unfused = MultiScaleConvBlock(out_channels=8, stride=2, fuse_branches=False)
        np.testing.assert_allclose(
            np.asarray(fused.apply(params, x)),
            np.asarray(unfused.apply(params, x)),
            atol=1e-5,
        )

    def test_im2col_equals_unfused(self):
        """im2col (one unfold + one fat GEMM, DESIGN §20 shape experiment) must
        be exactly the three separate convs on the SAME parameters."""
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(4, 16, 6)).astype(np.float32))
        plain = MultiScaleConvBlock(out_channels=8, stride=2, fuse_branches=False)
        params = plain.init(jax.random.key(0), x)
        im2col = MultiScaleConvBlock(out_channels=8, stride=2, im2col=True)
        assert jax.tree.structure(im2col.init(jax.random.key(1), x)) == (
            jax.tree.structure(params)
        )
        np.testing.assert_allclose(
            np.asarray(im2col.apply(params, x)),
            np.asarray(plain.apply(params, x)),
            atol=1e-5,
        )

    def test_lean_gn_equals_unfused(self):
        """lean_gn (stats on full length, normalize+GELU only at strided positions,
        summed partial matmuls instead of concat) must match the plain path on the
        SAME parameters — checkpoint layouts are shared."""
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(4, 16, 6)).astype(np.float32))
        plain = MultiScaleConvBlock(out_channels=8, stride=2, fuse_branches=False)
        params = plain.init(jax.random.key(0), x)
        lean = MultiScaleConvBlock(out_channels=8, stride=2, lean_gn=True)
        assert jax.tree.structure(lean.init(jax.random.key(1), x)) == (
            jax.tree.structure(params)
        )
        np.testing.assert_allclose(
            np.asarray(lean.apply(params, x)),
            np.asarray(plain.apply(params, x)),
            atol=1e-5,
        )

    def test_lean_gn_odd_stride_and_length(self):
        """Strided slice must match nn.Conv VALID semantics when stride doesn't
        divide the length (output length ceil(L / stride))."""
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(2, 15, 5)).astype(np.float32))
        plain = MultiScaleConvBlock(out_channels=6, stride=4, fuse_branches=False)
        params = plain.init(jax.random.key(0), x)
        lean = MultiScaleConvBlock(out_channels=6, stride=4, lean_gn=True)
        np.testing.assert_allclose(
            np.asarray(lean.apply(params, x)),
            np.asarray(plain.apply(params, x)),
            atol=1e-5,
        )

    def test_temporal_encoder_pipeline(self, cfg):
        mod = TemporalEncoder(cfg)
        x = jnp.ones((5, cfg.temporal_seq_len, cfg.spatial_channels))
        params = mod.init(jax.random.key(0), x)
        out = mod.apply(params, x)
        assert out.shape == (5, cfg.num_patches, cfg.d_llm)


class TestLoRA:
    def test_starts_as_identity_delta(self):
        """lora_B = 0 means output == base dense at init (peft behavior)."""
        mod = LoRADense(features=8, rank=4, alpha=8)
        x = jnp.ones((2, 6))
        params = mod.init(jax.random.key(0), x)
        base = x @ params["params"]["kernel"] + params["params"]["bias"]
        np.testing.assert_allclose(mod.apply(params, x), base, atol=1e-6)
        assert np.all(np.asarray(params["params"]["lora_B"]) == 0)

    def test_delta_scaling(self):
        mod = LoRADense(features=8, rank=4, alpha=8)
        x = jnp.ones((2, 6))
        params = mod.init(jax.random.key(0), x)
        params = jax.tree.map(lambda a: a, params)
        p = dict(params["params"])
        p["lora_B"] = jnp.ones_like(p["lora_B"])
        out = mod.apply({"params": p}, x)
        base = x @ p["kernel"] + p["bias"]
        delta = (x @ p["lora_A"]) @ p["lora_B"] * (8 / 4)
        np.testing.assert_allclose(out, base + delta, atol=1e-5)


class TestHead:
    def test_shapes(self, cfg):
        mod = PredictionHead(cfg)
        x = jnp.ones((7, cfg.num_patches, cfg.d_llm))
        params = mod.init(jax.random.key(0), x)
        out = mod.apply(params, x)
        assert out.shape == (7, cfg.prediction_horizon)

"""Reference-checkpoint importer tests: build a faithful fake of the reference's
torch state_dict (same module tree / tensor orientations), convert, and check the
params land with correct shapes/orientations and drive a working forward pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.models.ref_import import reference_state_dict_to_params

torch = pytest.importorskip("torch")


def make_fake_reference_state_dict(m, seed=0):
    """Tensors with the reference's exact names and torch orientations."""
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {}
    tables = {
        "node": m.num_nodes, "tod": m.num_tod, "doy": m.num_doy,
        "year": m.num_years, "season": m.num_seasons,
    }
    for name, vocab in tables.items():
        sd[f"spatio_temporal_embedding.{name}_embedding.weight"] = t(vocab, m.d_emb)

    cin = m.spatial_in_channels
    hc = m.spatial_channels
    for lin in ("lin_l", "lin_r"):
        sd[f"spatial_encoder.gat_conv.{lin}.weight"] = t(hc, cin)
        sd[f"spatial_encoder.gat_conv.{lin}.bias"] = t(hc)
    sd["spatial_encoder.gat_conv.att"] = t(1, m.spatial_heads, m.spatial_out_channels)
    sd["spatial_encoder.gat_conv.bias"] = t(hc)

    ch_in = hc
    for b, ch_out in enumerate(m.temporal_channel_list):
        base = f"temporal_encoder.conv_embedder.embedder.{b}"
        for j, k in enumerate(m.conv_kernel_sizes):
            sd[f"{base}.convs.{j}.0.weight"] = t(ch_out, ch_in, k)
            sd[f"{base}.convs.{j}.0.bias"] = t(ch_out)
            sd[f"{base}.convs.{j}.1.weight"] = t(ch_out)
            sd[f"{base}.convs.{j}.1.bias"] = t(ch_out)
        sd[f"{base}.final_conv.weight"] = t(ch_out, ch_out * 3, 1)
        sd[f"{base}.final_conv.bias"] = t(ch_out)
        ch_in = ch_out

    latent = m.temporal_channel_list[-1] * m.effective_patch_len
    sd["temporal_encoder.patcher.projection.weight"] = t(m.d_llm, latent)
    sd["temporal_encoder.patcher.projection.bias"] = t(m.d_llm)

    # peft-wrapped GPT-2 (reference modules.py:186): base_model.model prefix,
    # c_attn has base_layer + lora_A/lora_B.default
    llm = "llm_backbone.model.base_model.model"
    sd[f"{llm}.wpe.weight"] = t(m.llm_max_positions, m.d_llm)
    for i in range(m.llm_layers):
        h = f"{llm}.h.{i}"
        for ln in ("ln_1", "ln_2"):
            sd[f"{h}.{ln}.weight"] = t(m.d_llm)
            sd[f"{h}.{ln}.bias"] = t(m.d_llm)
        sd[f"{h}.attn.c_attn.base_layer.weight"] = t(m.d_llm, 3 * m.d_llm)
        sd[f"{h}.attn.c_attn.base_layer.bias"] = t(3 * m.d_llm)
        sd[f"{h}.attn.c_attn.lora_A.default.weight"] = t(m.lora_r, m.d_llm)
        sd[f"{h}.attn.c_attn.lora_B.default.weight"] = t(3 * m.d_llm, m.lora_r)
        sd[f"{h}.attn.c_proj.weight"] = t(m.d_llm, m.d_llm)
        sd[f"{h}.attn.c_proj.bias"] = t(m.d_llm)
        sd[f"{h}.mlp.c_fc.weight"] = t(m.d_llm, 4 * m.d_llm)
        sd[f"{h}.mlp.c_fc.bias"] = t(4 * m.d_llm)
        sd[f"{h}.mlp.c_proj.weight"] = t(4 * m.d_llm, m.d_llm)
        sd[f"{h}.mlp.c_proj.bias"] = t(m.d_llm)
    sd[f"{llm}.ln_f.weight"] = t(m.d_llm)
    sd[f"{llm}.ln_f.bias"] = t(m.d_llm)

    hidden = m.head_input_dim // m.head_hidden_ratio
    sd["prediction_head.mlp.0.weight"] = t(hidden, m.head_input_dim)
    sd["prediction_head.mlp.0.bias"] = t(hidden)
    sd["prediction_head.mlp.3.weight"] = t(m.prediction_horizon, hidden)
    sd["prediction_head.mlp.3.bias"] = t(m.prediction_horizon)
    return sd


class TestReferenceImport:
    def test_convert_and_forward(self, tiny_graph):
        cfg = tiny_config()
        m = cfg.model
        sd = make_fake_reference_state_dict(m)
        params = reference_state_dict_to_params(sd, m)

        model = TECMoLLM(m)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, m.temporal_seq_len, m.num_nodes, m.in_features)).astype(np.float32))
        tf = jnp.zeros((1, m.temporal_seq_len, 4), jnp.int32)
        init = model.init(
            jax.random.key(0), x, tf,
            jnp.asarray(tiny_graph.neighbors), jnp.asarray(tiny_graph.neighbor_mask),
        )["params"]
        # converted tree must structurally match the init tree
        init_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(init)[0]}
        conv_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
        assert init_paths == conv_paths
        for (path, a), (_, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(init)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=str),
        ):
            assert np.asarray(a).shape == np.asarray(b).shape, path

        out = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)}, x, tf,
            jnp.asarray(tiny_graph.neighbors), jnp.asarray(tiny_graph.neighbor_mask),
        )
        assert out.shape == (1, m.prediction_horizon, m.num_nodes, 1)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_ddp_prefix_stripping(self, tiny_graph):
        cfg = tiny_config()
        m = cfg.model
        sd = make_fake_reference_state_dict(m)
        sd_ddp = {"module." + k: v for k, v in sd.items()}
        params = reference_state_dict_to_params(sd_ddp, m)
        np.testing.assert_array_equal(
            params["head"]["fc1"]["bias"], sd["prediction_head.mlp.0.bias"].numpy()
        )

    def test_orientation_spot_checks(self):
        cfg = tiny_config()
        m = cfg.model
        sd = make_fake_reference_state_dict(m)
        params = reference_state_dict_to_params(sd, m)
        # torch Linear (out,in) -> kernel (in,out)
        np.testing.assert_array_equal(
            params["head"]["fc1"]["kernel"],
            sd["prediction_head.mlp.0.weight"].numpy().T,
        )
        # Conv1d (Cout,Cin,k) -> (k,Cin,Cout)
        w = sd["temporal_encoder.conv_embedder.embedder.0.convs.2.0.weight"].numpy()
        np.testing.assert_array_equal(
            params["temporal"]["block_0"]["conv_k7"]["kernel"], w.transpose(2, 1, 0)
        )
        # peft lora_A (r,in) -> (in,r)
        np.testing.assert_array_equal(
            params["llm"]["h_0"]["attn"]["c_attn"]["lora_A"],
            sd["llm_backbone.model.base_model.model.h.0.attn.c_attn.lora_A.default.weight"].numpy().T,
        )
        # HF Conv1D stays (in, out)
        np.testing.assert_array_equal(
            params["llm"]["h_0"]["mlp"]["c_fc"]["kernel"],
            sd["llm_backbone.model.base_model.model.h.0.mlp.c_fc.weight"].numpy(),
        )

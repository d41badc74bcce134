"""End-to-end numerical parity vs the reference architecture.

Builds a fake reference checkpoint (exact reference names/orientations, from
test_ref_import), imports it into our Flax model, and independently computes the
reference forward pass stage by stage with torch/HF/numpy:

    embedding (numpy) -> GATv2 per timestep (numpy, PyG semantics) + residual
    -> multi-scale convs + patching (torch) -> truncated GPT-2 + peft LoRA (HF)
    -> head MLP (torch) -> reshape

and asserts the final (B, L_out, N, 1) outputs agree. This is the strongest
checkpoint-parity evidence available without torch_geometric installed, and
directly supports the <1% MAE/RMSE parity target (BASELINE.md): identical weights
must produce identical predictions.

Note the spatial stage follows the architecture as *intended* (graph applied to
every timestep); the reference's shipped flattening only messages the first
stacked graph (SURVEY.md §2.d.1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.models.ref_import import reference_state_dict_to_params
from tests.test_modules import gatv2_numpy_reference
from tests.test_ref_import import make_fake_reference_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")


def reference_forward(sd, m, x, tf, graph):
    """The reference forward pass, stage by stage, torch/HF/numpy."""
    B, L, N, _ = x.shape
    t = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    # 1. SpatioTemporalEmbedding (reference modules.py:230-266)
    node = t["spatio_temporal_embedding.node_embedding.weight"]
    temporal = (
        t["spatio_temporal_embedding.tod_embedding.weight"][tf[:, :, 0]]
        + t["spatio_temporal_embedding.doy_embedding.weight"][tf[:, :, 1]]
        + t["spatio_temporal_embedding.year_embedding.weight"][tf[:, :, 2]]
        + t["spatio_temporal_embedding.season_embedding.weight"][tf[:, :, 3]]
    )  # (B, L, d)
    combined = node[None, None] + temporal[:, :, None]
    h = np.concatenate([x, combined], axis=-1)  # (B, L, N, 22)

    # 2-4. GATv2 per (B, L) slice + residual (PyG semantics)
    att = t["spatial_encoder.gat_conv.att"].reshape(m.spatial_heads, m.spatial_out_channels)
    gat_out = np.zeros_like(h)
    for b in range(B):
        for l in range(L):
            gat_out[b, l] = gatv2_numpy_reference(
                h[b, l], graph.neighbors, graph.neighbor_mask,
                t["spatial_encoder.gat_conv.lin_l.weight"].T,
                t["spatial_encoder.gat_conv.lin_l.bias"],
                t["spatial_encoder.gat_conv.lin_r.weight"].T,
                t["spatial_encoder.gat_conv.lin_r.bias"],
                att,
                t["spatial_encoder.gat_conv.bias"],
            )
    h = h + gat_out

    # 5-6. temporal encoder (torch): (B*N, C, L) conv pipeline + patching
    ht = torch.from_numpy(
        h.transpose(0, 2, 3, 1).reshape(B * N, h.shape[-1], L).astype(np.float32)
    )
    with torch.no_grad():
        ch_in = h.shape[-1]
        for blk, (ch_out, stride) in enumerate(
            zip(m.temporal_channel_list, m.temporal_strides)
        ):
            base = f"temporal_encoder.conv_embedder.embedder.{blk}"
            branches = []
            for j, k in enumerate(m.conv_kernel_sizes):
                conv = torch.nn.Conv1d(ch_in, ch_out, k, padding=(k - 1) // 2)
                conv.weight.copy_(torch.from_numpy(t[f"{base}.convs.{j}.0.weight"]))
                conv.bias.copy_(torch.from_numpy(t[f"{base}.convs.{j}.0.bias"]))
                gn = torch.nn.GroupNorm(1, ch_out)
                gn.weight.copy_(torch.from_numpy(t[f"{base}.convs.{j}.1.weight"]))
                gn.bias.copy_(torch.from_numpy(t[f"{base}.convs.{j}.1.bias"]))
                branches.append(torch.nn.functional.gelu(gn(conv(ht))))
            final = torch.nn.Conv1d(3 * ch_out, ch_out, 1, stride=stride)
            final.weight.copy_(torch.from_numpy(t[f"{base}.final_conv.weight"]))
            final.bias.copy_(torch.from_numpy(t[f"{base}.final_conv.bias"]))
            ht = final(torch.cat(branches, dim=1))
            ch_in = ch_out
        # patching: (B*N, D, L') -> (B*N, P, l*D) -> Linear -> (B*N, P, d_llm)
        ht = ht.permute(0, 2, 1)
        p = ht.shape[1] // m.effective_patch_len
        ht = ht.reshape(B * N, p, m.effective_patch_len * ht.shape[-1])
        proj = torch.nn.Linear(ht.shape[-1], m.d_llm)
        proj.weight.copy_(torch.from_numpy(t["temporal_encoder.patcher.projection.weight"]))
        proj.bias.copy_(torch.from_numpy(t["temporal_encoder.patcher.projection.bias"]))
        ht = proj(ht)

        # 7. truncated GPT-2 + LoRA (HF + peft), inputs_embeds path
        config = transformers.GPT2Config(
            n_embd=m.d_llm, n_head=m.llm_heads, n_layer=m.llm_layers,
            n_positions=m.llm_max_positions, vocab_size=100,
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        )
        gpt = transformers.GPT2Model(config)
        lora_cfg = peft.LoraConfig(
            r=m.lora_r, lora_alpha=m.lora_alpha, target_modules=["c_attn"],
            lora_dropout=0.0, bias="none",
        )
        gpt = peft.get_peft_model(gpt, lora_cfg)
        gpt.eval()
        llm_sd = {
            k[len("llm_backbone.model."):]: torch.from_numpy(np.asarray(v))
            for k, v in t.items()
            if k.startswith("llm_backbone.model.")
        }
        missing, unexpected = gpt.load_state_dict(llm_sd, strict=False)
        # wte and masked-fill buffers may be absent from the fake checkpoint;
        # nothing we feed depends on them
        assert not unexpected, unexpected
        out = gpt(inputs_embeds=ht).last_hidden_state  # (B*N, P, d_llm)

        # 8-10. head MLP + reshape
        flat = out.reshape(B * N, -1)
        fc1 = torch.nn.Linear(flat.shape[-1], flat.shape[-1] // m.head_hidden_ratio)
        fc1.weight.copy_(torch.from_numpy(t["prediction_head.mlp.0.weight"]))
        fc1.bias.copy_(torch.from_numpy(t["prediction_head.mlp.0.bias"]))
        fc2 = torch.nn.Linear(fc1.out_features, m.prediction_horizon)
        fc2.weight.copy_(torch.from_numpy(t["prediction_head.mlp.3.weight"]))
        fc2.bias.copy_(torch.from_numpy(t["prediction_head.mlp.3.bias"]))
        preds = fc2(torch.nn.functional.gelu(fc1(flat)))  # (B*N, L_out)
        final = preds.reshape(B, N, m.prediction_horizon).permute(0, 2, 1).unsqueeze(-1)
    return final.numpy()


def _run_parity(m, graph, B: int, atol: float, check_padded_gather: bool = True):
    """Shared parity body: fake reference checkpoint -> torch/HF/numpy stages vs
    our imported Flax model(s) on the same inputs."""
    rng = np.random.default_rng(0)
    L, N = m.temporal_seq_len, m.num_nodes
    x = rng.normal(0, 1, size=(B, L, N, m.in_features)).astype(np.float32)
    tf = np.stack(
        [
            rng.integers(0, m.num_tod, (B, L)),
            rng.integers(0, m.num_doy, (B, L)),
            rng.integers(0, m.num_years, (B, L)),
            rng.integers(0, m.num_seasons, (B, L)),
        ],
        axis=-1,
    ).astype(np.int32)

    sd = make_fake_reference_state_dict(m, seed=7)
    expect = reference_forward(sd, m, x, tf, graph)

    params = reference_state_dict_to_params(sd, m)
    params = jax.tree.map(jnp.asarray, params)
    if check_padded_gather:
        model = TECMoLLM(m)  # fp32, padded-gather GAT
        out = model.apply(
            {"params": params},
            jnp.asarray(x), jnp.asarray(tf),
            jnp.asarray(graph.neighbors), jnp.asarray(graph.neighbor_mask),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(out), expect, atol=atol)

    # stencil mode must agree with the same imported weights too
    from tec_mollm_tpu.models.tec_mollm import graph_inputs

    shifts, (g1, g2) = graph_inputs(graph)
    model_s = TECMoLLM(m, stencil_shifts=shifts)
    out_s = model_s.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(tf), g1, g2, deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out_s), expect, atol=atol)


class TestFullModelParity:
    def test_end_to_end_matches_reference_stages(self, tiny_graph):
        _run_parity(tiny_config().model, tiny_graph, B=2, atol=5e-4)

    @pytest.mark.slow
    def test_flagship_shape_parity(self):
        """Weight-import + forward parity at the EXACT shipped flagship shapes:
        2911 nodes, L_in=48, d_llm=768, 3 LoRA-GPT-2 layers (VERDICT r1 next #2 —
        round 1 only proved parity at the 48-node tiny config). One window, fp32,
        CPU; stencil path only (the padded-gather path is covered at tiny scale
        and the two modes are equivalence-tested in test_gat_stencil.py).

        Mirrors the reference checkpoint-load path (/root/reference/test.py:175-190)
        at full size; ~2-4 min, marked slow."""
        from tec_mollm_tpu.config import Config
        from tec_mollm_tpu.data.synthetic import grid_coordinates
        from tec_mollm_tpu.graph import build_graph

        cfg = Config().resolved()
        m = cfg.model
        assert (m.num_nodes, m.d_llm, m.llm_layers) == (2911, 768, 3)
        lat, lon = grid_coordinates(m.grid_h, m.grid_w)
        graph = build_graph(lat, lon, distance_threshold_km=150.0)
        _run_parity(m, graph, B=1, atol=5e-3, check_padded_gather=False)

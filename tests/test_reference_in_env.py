"""The reference-in-env machinery stays runnable (guards the head-to-head).

scripts/run_reference.py patches three env gaps (compat GATv2, surrogate
GPT-2 redirect, CPU autocast) so /root/reference trains unmodified. These
tests pin the pieces that must keep working for that to hold: the reference
model builds against our compat shim + surrogate checkpoint, runs a
forward/backward step, and its state_dict imports into our params via
ref_import with finite outputs.

Skipped when /root/reference or the (gitignored, regenerated-per-round)
surrogate weights are absent.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SURROGATE = os.path.join(REPO, "checkpoints", "surrogate_gpt2")

pytestmark = pytest.mark.skipif(
    not (
        os.path.isdir(REF)
        and os.path.exists(os.path.join(SURROGATE, "pytorch_model.bin"))
    ),
    reason="needs /root/reference and the regenerated surrogate weights",
)


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "compat"))
    sys.path.insert(0, REF)
    import transformers

    orig = transformers.AutoModel.from_pretrained.__func__
    transformers.AutoModel.from_pretrained = classmethod(
        lambda cls, name, *a, **k: orig(
            cls, SURROGATE if name == "gpt2" else name, *a, **k
        )
    )
    from src.model.tec_mollm import TEC_MoLLM

    cfg = {
        "num_nodes": 2911, "d_emb": 16, "spatial_in_channels_base": 6,
        "spatial_out_channels": 11, "spatial_heads": 2,
        "temporal_channel_list": [64, 128], "temporal_strides": [2, 2],
        "patch_len": 4, "d_llm": 768, "llm_layers": 3,
        "prediction_horizon": 12, "temporal_seq_len": 48, "num_years": 13,
    }
    torch.manual_seed(0)
    return TEC_MoLLM(cfg), torch


class TestReferenceInEnv:
    def test_forward_backward_step(self, ref_model):
        model, torch = ref_model
        n = 48
        edge_index = torch.tensor(
            [[0, 1, 2, 3], [1, 0, 3, 2]], dtype=torch.long
        )
        x = torch.randn(1, 48, n, 6)
        tf = torch.zeros(1, 48, n, 4)
        model.train()
        out = model(x, tf, edge_index, None)
        assert out.shape == (1, 12, n, 1)
        loss = (out**2).mean()
        loss.backward()
        grads = [
            p.grad for p in model.parameters() if p.requires_grad
        ]
        assert grads and all(
            g is not None and torch.isfinite(g).all() for g in grads
        )

    def test_state_dict_imports_and_forward_is_finite(self, ref_model):
        model, torch = ref_model
        import dataclasses

        import jax.numpy as jnp

        from tec_mollm_tpu.config import Config
        from tec_mollm_tpu.graph.builder import build_padded_neighbors
        from tec_mollm_tpu.models import TECMoLLM
        from tec_mollm_tpu.models.ref_import import (
            reference_state_dict_to_params,
        )

        n = 48
        cfg = Config()
        m = dataclasses.replace(cfg.model, num_nodes=n, grid_h=6, grid_w=8)
        sd = {
            k: v.detach().numpy() for k, v in model.state_dict().items()
        }
        params = reference_state_dict_to_params(sd, m)
        assert params["embedding"]["node"]["embedding"].shape[0] == n

        edge_index = np.array([[0, 1, 2, 3], [1, 0, 3, 2]], dtype=np.int32)
        neighbors, mask, _ = build_padded_neighbors(
            edge_index, np.ones(4, np.float32), n
        )
        ours = TECMoLLM(m)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 48, n, 6)
        ).astype(np.float32))
        tf = jnp.zeros((1, 48, 4), jnp.int32)
        out = ours.apply(
            {"params": params}, x, tf, jnp.asarray(neighbors),
            jnp.asarray(mask),
        )
        arr = np.asarray(out)
        assert arr.shape[0] == 1 and arr.shape[-2] == n
        assert np.isfinite(arr).all()

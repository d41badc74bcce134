"""Full reference-checkpoint importer: TEC_MoLLM (PyTorch) state_dict -> our params.

Enables the BASELINE.md parity check (test MAE/RMSE within 1% of the reference
checkpoint) by loading a checkpoint trained with /root/reference/train.py directly
into the Flax model. Name mapping follows the reference module tree
(tec_mollm.py:25-56, modules.py):

    spatio_temporal_embedding.{node,tod,doy,year,season}_embedding.weight
        -> embedding/{node,tod,doy,year,season}/embedding
    spatial_encoder.gat_conv.{lin_l,lin_r}.{weight,bias}  (torch Linear: (out,in))
        -> spatial/gat/{lin_l,lin_r}/{kernel^T,bias}
    spatial_encoder.gat_conv.att (1, H, C) -> spatial/gat/att (1, H*C)
    spatial_encoder.gat_conv.bias -> spatial/gat/bias
    temporal_encoder.conv_embedder.embedder.{b}.convs.{j}.{0,1}.*  (torch Conv1d:
        (Cout, Cin, k); GroupNorm) -> temporal/block_{b}/{conv_kK,norm_kK}/*
    temporal_encoder.conv_embedder.embedder.{b}.final_conv.* -> .../final_conv/*
    temporal_encoder.patcher.projection.* -> temporal/patcher/projection/*
    llm_backbone.model.(peft prefixes).h.{i}.* -> llm/h_{i}/* (see hf_import)
    prediction_head.mlp.{0,3}.* -> head/{fc1,fc2}/*

DDP 'module.' / torch.compile '_orig_mod.' prefixes are stripped, matching the
reference's own checkpoint fixup (test.py:179-190).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tec_mollm_tpu.config import ModelConfig
from tec_mollm_tpu.models.hf_import import gpt2_state_dict_to_params, normalize_keys


def reference_state_dict_to_params(
    state_dict: Mapping[str, Any], cfg: ModelConfig
) -> dict[str, Any]:
    sd = normalize_keys(state_dict)

    def get(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(f"{key} not in reference checkpoint")
        return sd[key]

    def linear(prefix: str) -> dict[str, np.ndarray]:
        return {"kernel": get(f"{prefix}.weight").T, "bias": get(f"{prefix}.bias")}

    # --- embeddings ---
    embedding = {
        name: {"embedding": get(f"spatio_temporal_embedding.{name}_embedding.weight")}
        for name in ("node", "tod", "doy", "year", "season")
    }
    # The reference sizes its node table from config (hardcoded 2911,
    # train.py:263) but only ever indexes rows [0, N_data) (modules.py:245);
    # our model sizes the table to the data grid. Slicing the imported table
    # to cfg.num_nodes rows is therefore value-exact for any N_data <= table.
    node_w = embedding["node"]["embedding"]
    if node_w.shape[0] < cfg.num_nodes:
        raise ValueError(
            f"reference node table has {node_w.shape[0]} rows < "
            f"num_nodes {cfg.num_nodes}"
        )
    embedding["node"]["embedding"] = node_w[: cfg.num_nodes]

    # --- spatial encoder (GATv2) ---
    att = get("spatial_encoder.gat_conv.att")
    spatial = {
        "gat": {
            "lin_l": linear("spatial_encoder.gat_conv.lin_l"),
            "lin_r": linear("spatial_encoder.gat_conv.lin_r"),
            "att": att.reshape(1, -1),
            "bias": get("spatial_encoder.gat_conv.bias"),
        }
    }

    # --- temporal encoder ---
    temporal: dict[str, Any] = {}
    for b in range(len(cfg.temporal_channel_list)):
        base = f"temporal_encoder.conv_embedder.embedder.{b}"
        block: dict[str, Any] = {}
        for j, k in enumerate(cfg.conv_kernel_sizes):
            w = get(f"{base}.convs.{j}.0.weight")  # (Cout, Cin, k)
            block[f"conv_k{k}"] = {
                "kernel": w.transpose(2, 1, 0),  # -> (k, Cin, Cout)
                "bias": get(f"{base}.convs.{j}.0.bias"),
            }
            block[f"norm_k{k}"] = {
                "scale": get(f"{base}.convs.{j}.1.weight"),
                "bias": get(f"{base}.convs.{j}.1.bias"),
            }
        wf = get(f"{base}.final_conv.weight")  # (Cout, 3*Cout, 1)
        block["final_conv"] = {
            "kernel": wf.transpose(2, 1, 0),
            "bias": get(f"{base}.final_conv.bias"),
        }
        temporal[f"block_{b}"] = block
    temporal["patcher"] = {"projection": linear("temporal_encoder.patcher.projection")}

    # --- LLM backbone: strip the wrapper and reuse the GPT-2 importer ---
    llm_sd = {
        key[len("llm_backbone.model."):]: val
        for key, val in sd.items()
        if key.startswith("llm_backbone.model.")
    }
    llm = gpt2_state_dict_to_params(llm_sd, cfg)

    # --- prediction head: Sequential(Linear, GELU, Dropout, Linear) ---
    head = {
        "fc1": linear("prediction_head.mlp.0"),
        "fc2": linear("prediction_head.mlp.3"),
    }

    return {
        "embedding": embedding,
        "spatial": spatial,
        "temporal": temporal,
        "llm": llm,
        "head": head,
    }


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> dict[str, Any]:
    """torch .pth file from the reference's training -> our full param tree."""
    from tec_mollm_tpu.models.hf_import import load_torch_checkpoint

    return reference_state_dict_to_params(load_torch_checkpoint(path), cfg)

"""Export our Flax GPT-2 backbone params to an HF-format torch checkpoint.

The inverse of models/hf_import.py, used by the surrogate-pretraining path
(scripts/pretrain_backbone.py): a ByteLM pretrained in-env is saved exactly the
way a real `AutoModel.from_pretrained('gpt2')` checkpoint would arrive
(reference /root/reference/src/model/modules.py:165-170), so the downstream
`train.py --gpt2-checkpoint` import path is exercised unmodified.

Orientation notes (mirror of hf_import): HF Conv1D weights are (in, out) — the
same as our Dense kernels, so no transposes anywhere; LayerNorm scale -> weight.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


def backbone_params_to_state_dict(
    backbone: dict[str, Any],
    num_layers: int,
    wte: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """GPT2Backbone param tree -> flat HF GPT2Model state dict (numpy)."""

    def arr(x) -> np.ndarray:
        return np.asarray(x, dtype=np.float32)

    def dense(p: dict[str, Any], prefix: str, out: dict[str, np.ndarray]) -> None:
        out[f"{prefix}.weight"] = arr(p["kernel"])
        out[f"{prefix}.bias"] = arr(p["bias"])

    def ln(p: dict[str, Any], prefix: str, out: dict[str, np.ndarray]) -> None:
        out[f"{prefix}.weight"] = arr(p["scale"])
        out[f"{prefix}.bias"] = arr(p["bias"])

    sd: dict[str, np.ndarray] = {"wpe.weight": arr(backbone["wpe"])}
    if wte is not None:
        sd["wte.weight"] = arr(wte)
    for i in range(num_layers):
        blk = backbone[f"h_{i}"]
        ln(blk["ln_1"], f"h.{i}.ln_1", sd)
        dense(blk["attn"]["c_attn"], f"h.{i}.attn.c_attn", sd)
        dense(blk["attn"]["c_proj"], f"h.{i}.attn.c_proj", sd)
        ln(blk["ln_2"], f"h.{i}.ln_2", sd)
        dense(blk["mlp"]["c_fc"], f"h.{i}.mlp.c_fc", sd)
        dense(blk["mlp"]["c_proj"], f"h.{i}.mlp.c_proj", sd)
    ln(backbone["ln_f"], "ln_f", sd)
    return sd


def save_hf_checkpoint(
    state_dict: dict[str, np.ndarray],
    out_dir: str,
    meta: dict[str, Any] | None = None,
) -> str:
    """Write pytorch_model.bin (+ a descriptive config.json) into out_dir —
    the directory layout hf_import.load_torch_checkpoint resolves."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "pytorch_model.bin")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in state_dict.items()}, path)
    d = state_dict["wpe.weight"].shape[1]
    cfg = {
        "model_type": "gpt2",
        "n_embd": int(d),
        "n_positions": int(state_dict["wpe.weight"].shape[0]),
        "n_layer": sum(1 for k in state_dict if k.endswith(".ln_1.weight")),
        **(meta or {}),
    }
    if "wte.weight" in state_dict:
        # without this, transformers builds the default 50257-token embedding
        # and fails to load the byte-LM's 256-row wte (AutoModel path used by
        # scripts/run_reference.py)
        cfg["vocab_size"] = int(state_dict["wte.weight"].shape[0])
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return path

"""Weight importers: HuggingFace / PyTorch checkpoints -> our Flax param pytrees.

Needed for parity runs against the reference (SURVEY.md §7 "GPT-2 weight-exact
port"): HF GPT-2 stores Conv1D weights as (in, out) — the same orientation as our
Dense kernels, so attention/MLP weights copy without transpose. peft LoRA stores
lora_A as (r, in) and lora_B as (out, r), which transpose into our (in, r) / (r, out).

Also handles the reference's checkpoint-key fixups: stripping 'module.' (DDP),
'_orig_mod.' (torch.compile) (reference test.py:179-190), and peft's
'base_model.model.' wrapper prefix.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tec_mollm_tpu.config import ModelConfig

_STRIP_PREFIXES = ("module.", "_orig_mod.", "base_model.model.", "transformer.")


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def normalize_keys(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Strip wrapper prefixes anywhere in the key and drop peft adapter suffixes."""
    out: dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        for prefix in _STRIP_PREFIXES:
            while key.startswith(prefix):
                key = key[len(prefix):]
        # peft writes c_attn.lora_A.default.weight and keeps the frozen base at
        # c_attn.base_layer.weight
        key = key.replace(".base_layer.", ".")
        key = key.replace(".default.weight", ".weight")
        out[key] = _to_numpy(value)
    return out


def gpt2_state_dict_to_params(
    state_dict: Mapping[str, Any], cfg: ModelConfig
) -> dict[str, Any]:
    """HF GPT2Model (optionally peft-wrapped) state dict -> GPT2Backbone params.

    Only the submodules our backbone uses are read: wpe, h.{i}.{ln_1, attn.c_attn,
    attn.c_proj, ln_2, mlp.c_fc, mlp.c_proj}, ln_f. wte is ignored (inputs_embeds
    path, reference modules.py:205-209).
    """
    sd = normalize_keys(state_dict)

    def get(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(f"{key} missing from checkpoint (have e.g. {list(sd)[:5]})")
        return sd[key]

    def dense(prefix: str, lora: bool = False) -> dict[str, np.ndarray]:
        p = {
            "kernel": get(f"{prefix}.weight"),  # HF Conv1D: (in, out) — no transpose
            "bias": get(f"{prefix}.bias"),
        }
        if lora:
            a_key, b_key = f"{prefix}.lora_A.weight", f"{prefix}.lora_B.weight"
            if a_key in sd:
                p["lora_A"] = sd[a_key].T  # (r, in) -> (in, r)
                p["lora_B"] = sd[b_key].T  # (out, r) -> (r, out)
        return p

    def ln(prefix: str) -> dict[str, np.ndarray]:
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    params: dict[str, Any] = {"wpe": get("wpe.weight")[: cfg.llm_max_positions]}
    for i in range(cfg.llm_layers):
        params[f"h_{i}"] = {
            "ln_1": ln(f"h.{i}.ln_1"),
            "attn": {
                "c_attn": dense(f"h.{i}.attn.c_attn", lora=True),
                "c_proj": dense(f"h.{i}.attn.c_proj"),
            },
            "ln_2": ln(f"h.{i}.ln_2"),
            "mlp": {
                "c_fc": dense(f"h.{i}.mlp.c_fc"),
                "c_proj": dense(f"h.{i}.mlp.c_proj"),
            },
        }
    params["ln_f"] = ln("ln_f")
    return params


def merge_gpt2_params(existing: dict[str, Any], imported: dict[str, Any]) -> dict[str, Any]:
    """Overlay imported leaves onto an init pytree (keeps fresh LoRA init when the
    checkpoint has no adapters), checking shapes."""
    merged: dict[str, Any] = {}
    for key, init_val in existing.items():
        if key not in imported:
            merged[key] = init_val
            continue
        imp = imported[key]
        if isinstance(init_val, dict):
            merged[key] = merge_gpt2_params(init_val, imp)
        else:
            init_arr = np.asarray(init_val)
            if tuple(imp.shape) != tuple(init_arr.shape):
                raise ValueError(
                    f"shape mismatch for {key}: checkpoint {imp.shape} vs model {init_arr.shape}"
                )
            merged[key] = imp.astype(init_arr.dtype)
    return merged


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a torch state_dict from a .pt/.bin/.pth file, a safetensors file, or an
    HF model directory (pytorch_model.bin / model.safetensors)."""
    import os

    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.safetensors"):
            candidate = os.path.join(path, name)
            if os.path.exists(candidate):
                path = candidate
                break
        else:
            raise FileNotFoundError(f"No model weights found in directory {path}")

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _to_numpy(v) for k, v in obj.items()}


def load_gpt2_into_model_params(
    model_params: dict[str, Any],
    state_dict: Mapping[str, Any],
    cfg: ModelConfig,
    llm_module_name: str = "llm",
) -> dict[str, Any]:
    """Return a copy of full-model params with the GPT-2 subtree replaced by
    checkpoint weights (random init for everything the checkpoint lacks)."""
    imported = gpt2_state_dict_to_params(state_dict, cfg)
    out = dict(model_params)
    out[llm_module_name] = merge_gpt2_params(dict(model_params[llm_module_name]), imported)
    return out

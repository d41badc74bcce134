"""Parameter partition specs: GSPMD sharding hints per parameter path.

Default is pure data parallelism (all params replicated) — the only strategy the
reference has (SURVEY.md §2). With model_parallel > 1 the GPT-2 backbone and the
prediction head shard Megatron-style over the 'model' axis:

  * attn c_attn kernel (d, 3d): column-parallel  -> P(None, model)  (+ bias, lora_B)
  * attn c_proj kernel (d, d):  row-parallel     -> P(model, None)
  * mlp  c_fc   kernel (d, 4d): column-parallel  -> P(None, model)
  * mlp  c_proj kernel (4d, d): row-parallel     -> P(model, None)
  * head fc1 (P*d_llm, hidden): column-parallel; head fc2: row-parallel

Everything else (embeddings, GAT, temporal convs, layernorms, small biases) is
replicated — those tensors are tiny next to the backbone. These are hints to GSPMD,
not manual collectives: XLA inserts the reduce-scatter/all-gather/psum pattern and
keeps them on ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(tokens: list[str], model_axis: str) -> P:
    path = "/".join(tokens)
    is_kernel = tokens[-1] == "kernel"
    if "llm" in tokens:
        if "c_attn" in tokens:
            if is_kernel or tokens[-1] == "lora_B":
                return P(None, model_axis)  # column-parallel qkv
            if tokens[-1] == "bias":
                return P(model_axis)
            return P()  # lora_A replicated (small, contracted on input)
        if "attn" in tokens and "c_proj" in tokens and is_kernel:
            return P(model_axis, None)  # row-parallel output proj
        if "c_fc" in tokens:
            if is_kernel:
                return P(None, model_axis)
            if tokens[-1] == "bias":
                return P(model_axis)
        if "mlp" in tokens and "c_proj" in tokens and is_kernel:
            return P(model_axis, None)
        return P()
    if "head" in tokens:
        if "fc1" in tokens:
            if is_kernel:
                return P(None, model_axis)
            if tokens[-1] == "bias":
                return P(model_axis)
        if "fc2" in tokens and is_kernel:
            return P(model_axis, None)
        return P()
    del path
    return P()


def param_pspecs(params: Any, model_parallel: int, model_axis: str = "model") -> Any:
    """Pytree of PartitionSpecs matching `params`."""

    def spec(path, leaf) -> P:
        if model_parallel <= 1:
            return P()
        tokens = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        s = _spec_for_path(tokens, model_axis)
        # guard: only shard dims that divide evenly; else replicate
        for dim, axis in enumerate(s):
            if axis is not None and leaf.shape[dim] % model_parallel != 0:
                return P()
        if len(s) > leaf.ndim:
            return P()
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(
    params: Any, mesh: Mesh, model_parallel: int = 1, model_axis: str = "model"
) -> Any:
    """Pytree of NamedShardings for jit in_shardings / device_put."""
    specs = param_pspecs(params, model_parallel, model_axis)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))

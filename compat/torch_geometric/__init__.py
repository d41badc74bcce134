"""Minimal first-party torch_geometric stand-in for running the PyTorch
reference (/root/reference) in this environment, where the real PyG wheel is
absent. Implements ONLY what the reference imports: `torch_geometric.nn.GATv2Conv`
(modules.py:8, :329-336).

This is not a copy of PyG — it is a ~100-line re-implementation of the GATv2
message-passing semantics as documented in the PyG papers/API, with parameter
names and shapes matching PyG's state_dict contract (lin_l/lin_r/att/bias) so
checkpoints trained through it are importable by
tec_mollm_tpu.models.ref_import. Used by scripts/run_reference.py to close the
BASELINE.md accuracy-parity north star (train the actual reference in-env).
"""

__version__ = "0.0-compat"

from . import nn  # noqa: F401

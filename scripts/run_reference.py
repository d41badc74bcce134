"""Run the UNMODIFIED PyTorch reference (/root/reference/{train,test}.py) in-env.

The reference cannot run as-is in this environment for exactly three reasons,
each patched here at the driver level (the reference tree is read-only and
untouched):

  1. torch_geometric is not installed  -> compat/torch_geometric (first-party
     GATv2Conv, equivalence-tested against our JAX GATv2 in tests/test_pyg_shim.py).
  2. AutoModel.from_pretrained('gpt2') needs network (modules.py:165); offline
     here -> redirected to the local surrogate GPT-2 checkpoint dir, the same
     weights our own --gpt2-checkpoint path consumes (BASELINE.md round-3).
  3. CPU-only quirks: torch.autocast(device_type='cuda') raises on a CPU-only
     box -> mapped to a no-op context; test.py:37 omits the required
     edge_weight arg (reference bug, SURVEY.md 2.d.2) -> forward patched to
     make it optional.

Everything else — model, data pipeline, training loop, metrics — is the
reference's own code executing its own semantics.

Usage:
    python scripts/run_reference.py --workdir /tmp/refwork train \
        --epochs 6 --batch_size 8 --accumulation_steps 1 --train_stride 1 \
        --num_workers 2
    python scripts/run_reference.py --workdir /tmp/refwork test \
        --model_checkpoint latest
"""

from __future__ import annotations

import argparse
import contextlib
import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True,
                        help="dir containing data/processed; checkpoints/logs land here")
    parser.add_argument("--ref-dir", default="/root/reference")
    parser.add_argument("--gpt2-dir",
                        default=os.path.join(REPO, "checkpoints/surrogate_gpt2"))
    parser.add_argument("script", choices=["train", "test"])
    parser.add_argument("rest", nargs=argparse.REMAINDER,
                        help="args passed through to the reference script")
    args = parser.parse_args()

    sys.path.insert(0, os.path.join(REPO, "compat"))
    sys.path.insert(0, args.ref_dir)

    import torch
    import transformers

    # --- patch 2: offline GPT-2 -> local surrogate checkpoint ---
    orig_from_pretrained = transformers.AutoModel.from_pretrained.__func__
    gpt2_dir = args.gpt2_dir

    def patched_from_pretrained(cls, name, *a, **k):
        if name == "gpt2":
            name = gpt2_dir
        return orig_from_pretrained(cls, name, *a, **k)

    transformers.AutoModel.from_pretrained = classmethod(patched_from_pretrained)

    # --- patch 3a: autocast('cuda') raises on CPU-only torch ---
    if not torch.cuda.is_available():
        orig_autocast = torch.autocast

        class _Autocast:
            def __init__(self, device_type="cuda", *a, **k):
                self._inner = (
                    contextlib.nullcontext()
                    if device_type == "cuda"
                    else orig_autocast(device_type, *a, **k)
                )

            def __enter__(self):
                return self._inner.__enter__()

            def __exit__(self, *exc):
                return self._inner.__exit__(*exc)

        torch.autocast = _Autocast

    # --- patch 3b: test.py:37 omits edge_weight (reference bug, SURVEY 2.d.2) ---
    import src.model.tec_mollm as ref_tec_mollm

    orig_forward = ref_tec_mollm.TEC_MoLLM.forward

    def forward_optional_ew(self, x, time_features, edge_index, edge_weight=None):
        return orig_forward(self, x, time_features, edge_index, edge_weight)

    ref_tec_mollm.TEC_MoLLM.forward = forward_optional_ew

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    script_path = os.path.join(args.ref_dir, f"{args.script}.py")
    sys.argv = [script_path] + list(args.rest)
    runpy.run_path(script_path, run_name="__main__")


if __name__ == "__main__":
    main()

"""Custom TPU ops: Pallas kernels with XLA fallbacks.

Kernels are opt-in from the model configs; every op has a pure-XLA reference
implementation used on CPU (tests) and as the numerical golden."""

"""tec-mollm-tpu: a TPU-native JAX/XLA/Pallas framework for ionospheric TEC forecasting.

A from-scratch rebuild of the capabilities of PANXIONG-CN/TEC-MoLLM (see SURVEY.md):
spatio-temporal forecasting of Total Electron Content on a 41x71 geographic grid with a
hybrid embedding -> graph-attention -> multi-scale-conv -> LoRA-GPT-2 -> MLP architecture,
plus the full data / graph / training / evaluation pipeline around it.

Layout:
    config       single dataclass config shared by train/eval (fixes reference's dict drift)
    data         HDF5 ingestion, feature engineering, scalers, sliding-window datasets
    graph        geographic graph construction + padded neighbor tables for TPU
    models       Flax modules: embeddings, GATv2, temporal encoder, LoRA-GPT-2, head
    ops          Pallas kernels (graph attention, flash attention) + fused XLA ops
    parallel     device mesh + sharding rules (dp x tp over ICI)
    training     loss, schedules, optimizer, train step, trainer, checkpointing
    evaluation   per-horizon metric suite + evaluation harness
    utils        logging, run naming, profiling
"""

__version__ = "0.1.0"

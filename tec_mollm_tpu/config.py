"""Single source-of-truth configuration.

The reference duplicates its model config as two hand-built dicts (train.py:262-269 and
test.py:150-156 of /root/reference) that must be kept in sync by hand. Here a single
dataclass is shared by preprocessing, training, evaluation, and benchmarking, with the
derived quantities (conv output length, patch length auto-adjustment, patch count)
computed in one place (reference: train.py:249-260).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference defaults: train.py:262-269)."""

    num_nodes: int = 2911          # 41 x 71 grid
    grid_h: int = 41
    grid_w: int = 71
    in_features: int = 6           # TEC + 5 space-weather indices
    d_emb: int = 16                # all five embedding tables share this dim
    num_years: int = 13            # year-index vocabulary (2013..2025)
    num_tod: int = 12              # 2-hour slots per day
    num_doy: int = 366
    num_seasons: int = 4

    # Spatial encoder (GATv2), reference modules.py:315-338
    spatial_out_channels: int = 11
    spatial_heads: int = 2
    gat_negative_slope: float = 0.2
    gat_dropout: float = 0.1

    # Temporal encoder, reference modules.py:13-154
    temporal_channel_list: tuple[int, ...] = (64, 128)
    temporal_strides: tuple[int, ...] = (2, 2)
    conv_kernel_sizes: tuple[int, ...] = (3, 5, 7)
    patch_len: int = 4

    # LLM backbone, reference modules.py:156-209
    d_llm: int = 768
    llm_layers: int = 3
    llm_heads: int = 12
    llm_mlp_ratio: int = 4
    llm_max_positions: int = 1024
    lora_r: int = 32
    lora_alpha: int = 64
    lora_dropout: float = 0.1
    llm_dropout: float = 0.1       # GPT-2 embd/resid/attn dropout (HF default 0.1)

    # Head + output, reference modules.py:268-313
    head_hidden_ratio: int = 4
    head_dropout: float = 0.1
    post_llm_dropout: float = 0.1  # reference tec_mollm.py:115
    prediction_horizon: int = 12   # L_out

    # Input window
    temporal_seq_len: int = 48     # L_in

    # RevIN-style per-window instance normalization of the TEC channel
    # (beyond-reference, opt-in): normalize channel 0 by its own per-(window,
    # node) mean/std on the way in, denormalize predictions on the way out.
    # A zero-output model then predicts exactly the input-window mean — the
    # Historical-Average baseline — so training starts AT the baseline and
    # learns deviations; targets distribution shift across the solar cycle
    # (the strided-regime failure mode, BASELINE.md 13-year rows).
    revin: bool = False

    # Probabilistic forecasting (beyond-reference, opt-in): non-empty tuple of
    # quantile levels (must include 0.5, strictly increasing, all in (0,1)).
    # The head then emits one forecast per level per horizon, trained with
    # pinball loss instead of Huber; levels are kept non-crossing by sorting
    # along the quantile axis. () = the reference's deterministic point model.
    quantiles: tuple[float, ...] = ()

    @property
    def num_outputs(self) -> int:
        """Output channels per (horizon, node): 1 point value or len(quantiles)."""
        return max(1, len(self.quantiles))

    @property
    def median_index(self) -> int:
        """Index of the 0.5 level — the point forecast in quantile mode."""
        return self.quantiles.index(0.5) if self.quantiles else 0

    @property
    def spatial_in_channels(self) -> int:
        """Channels entering the GNN = raw features + embedding dim (22 by default)."""
        return self.in_features + self.d_emb

    @property
    def spatial_channels(self) -> int:
        """GATv2 output channels = out_channels * heads (residual requires == input)."""
        return self.spatial_out_channels * self.spatial_heads

    @property
    def conv_output_len(self) -> int:
        """Sequence length after the strided conv stack (reference train.py:251)."""
        length = self.temporal_seq_len
        for s in self.temporal_strides:
            length = length // s
        return length

    @property
    def effective_patch_len(self) -> int:
        """patch_len auto-adjusted 4 -> 2 -> 1 so it divides conv_output_len
        (reference train.py:255-260)."""
        p = self.patch_len
        if self.conv_output_len % p != 0:
            p = 2 if self.conv_output_len % 2 == 0 else 1
        return p

    @property
    def num_patches(self) -> int:
        return self.conv_output_len // self.effective_patch_len

    @property
    def head_input_dim(self) -> int:
        return self.d_llm * self.num_patches

    def validate(self) -> None:
        if self.spatial_channels != self.spatial_in_channels:
            raise ValueError(
                "Residual connection requires GAT out (out_channels*heads="
                f"{self.spatial_channels}) == GAT in ({self.spatial_in_channels})"
            )
        if self.num_nodes != self.grid_h * self.grid_w:
            raise ValueError("num_nodes must equal grid_h * grid_w")
        if self.num_patches < 1:
            raise ValueError(
                f"temporal_seq_len={self.temporal_seq_len} too short for strides "
                f"{self.temporal_strides} and patch_len={self.patch_len}"
            )
        if self.d_llm % self.llm_heads != 0:
            raise ValueError("d_llm must be divisible by llm_heads")
        if self.quantiles:
            q = self.quantiles
            if any(not (0.0 < v < 1.0) for v in q):
                raise ValueError(f"quantiles must lie in (0, 1): {q}")
            if any(b <= a for a, b in zip(q, q[1:])):
                raise ValueError(f"quantiles must be strictly increasing: {q}")
            if 0.5 not in q:
                raise ValueError(
                    f"quantiles must include 0.5 (the point forecast): {q}"
                )


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference defaults: train.py:170-198, :366, :372)."""

    L_in: int = 48
    L_out: int = 12
    epochs: int = 50
    batch_size: int = 2            # per-replica microbatch
    accumulation_steps: int = 6
    lr: float = 1e-4
    weight_decay: float = 1e-2
    clip_grad_norm: float = 1.0
    huber_delta: float = 1.0
    train_stride: int = 12
    val_stride: int = 1
    # Keep only the chronologically last fraction of validation windows for
    # model selection (1.0 = the reference's full-period validation). Under
    # distribution shift the val tail is the closest proxy for the test epoch:
    # on the solar-cycle archive full-period val RANKED THE ARMS BACKWARDS
    # (BASELINE.md "RevIN under distribution shift").
    val_tail_frac: float = 1.0
    patience: int = 20
    min_delta: float = 1e-4
    # CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=1e-7), stepped once per
    # optimizer update exactly as the reference does (train.py:109, :366).
    sched_t0: int = 10
    sched_t_mult: int = 2
    sched_eta_min: float = 1e-7
    seed: int = 0
    # dropout PRNG implementation: 'rbg' compiles ~8x faster than threefry through
    # the TPU compiler at identical step time (measured interleaved on v5e)
    prng_impl: str = "rbg"
    bf16: bool = True              # bf16 compute, fp32 params (no loss scaling on TPU)
    # Remat on the GPT-2 blocks trades ~23% step time for activation memory; at the
    # default B=8/L_in=48 everything fits without it (measured on v5e). Enable for
    # long-context / large-batch configs.
    remat_llm: bool = False
    # jax.checkpoint policy when remat_llm is on (models/gpt2.REMAT_POLICIES):
    # None/'full' = save nothing; 'dots_saveable' = keep matmul outputs and
    # recompute only elementwise ops (selective remat)
    remat_policy: str | None = None
    # Run AdamW+clip on ONE flattened vector instead of ~80 per-leaf tensors:
    # identical math, but collapses hundreds of microscopic fused kernels into a
    # few (the per-leaf update measured 8.8 ms of the 186 ms step on v5e).
    # Auto-disabled under tensor parallelism, where flattening sharded leaves
    # would force per-step regathers (see build_optimizer).
    flatten_optimizer: bool = True
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1        # tensor-parallel degree over the 'model' mesh axis
    shuffle: bool = True
    log_every_epochs: int = 10     # detailed metric dump cadence (reference train.py:400)
    # Drain the dispatch pipeline with one scalar host readback every N train/val
    # batches. On remote/tunneled backends enqueue returns immediately, so an
    # un-synced epoch pins every staged batch buffer on the host — a 13-year
    # stride-3 epoch (1,636 batches x ~14 MB) grew the train process to 123 GB
    # and drew the OOM killer. One readback per 64 batches bounds in-flight
    # memory at ~1 GB for ~one extra RTT per 64 steps (negligible on-chip).
    host_sync_every: int = 64
    # Default per-replica batch for evaluation CLIs (test.py/predict.py) when
    # --batch-size is not given. B=16 measured optimal at the flagship config
    # (157.5 w/s at B=32 < 162.0 at B=16, BASELINE.md); memory-bound presets
    # override it (scale_up: eval at B=16 exceeds single-chip v5e HBM).
    eval_batch_size: int = 16
    # Exponential moving average of the trainable parameters (beyond-reference;
    # standard production-forecasting tool). 0.0 = off. When set (e.g. 0.999),
    # validation, best-checkpoint selection, and the saved best params all use
    # the EMA weights; the raw weights keep training. The EMA tracks ONLY the
    # trainable tree (~3M params) and is initialized AT the initial weights
    # (no zero-debias needed), so the added step cost is a few elementwise ops.
    ema_decay: float = 0.0
    # Device-resident archive mode (data/device_data.py): keep the split's
    # de-duplicated raw series (~0.5 GB at 13-year scale) in HBM and gather
    # windows on device; the host ships only window-start indices per step.
    # Removes the ~48x-redundant host->device window stream that made stride-1
    # archive epochs tunnel-bound (1-2 h/epoch in round 3). Requires archives
    # with the *_raw.npz export (preprocess CLI from round 4 on).
    device_data: bool = False
    # Mid-epoch checkpoint cadence in macro steps (0 = epoch boundaries only).
    # At archive scale one epoch is tens of minutes of wall (BASELINE.md 13-year
    # rows: 61 min) and hard failures (tunnel death, SIGKILL) get no signal —
    # a periodic resumable save bounds the loss to N steps. Collective-safe on
    # multihost pods: every host executes the same step count, so all enter the
    # save together. Resume re-derives the epoch's deterministic order and
    # skips the already-trained batches (BatchLoader.iter_from).
    checkpoint_every_steps: int = 0


@dataclass(frozen=True)
class DataConfig:
    """Dataset / preprocessing parameters (reference preprocess.py, data_loader.py)."""

    raw_dir: str = "data/raw"
    processed_dir: str = "data/processed"
    years: tuple[int, ...] = tuple(range(2013, 2026))
    file_pattern: str = "CRIM_SW2hr_AI_v1.2_{year}_DataDrivenRange_CN.hdf5"
    train_end: str = "2021-12-31 23:59:59"
    val_start: str = "2022-01-01 00:00:00"
    val_end: str = "2023-12-31 23:59:59"
    test_start: str = "2024-01-01 00:00:00"
    horizon: int = 12
    # Graph construction (reference graph_constructor.py:61, :34-59)
    distance_threshold_km: float = 150.0
    earth_radius_km: float = 6371.0

    def file_paths(self) -> list[str]:
        return [
            f"{self.raw_dir}/{self.file_pattern.format(year=y)}" for y in self.years
        ]


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    def resolved(self) -> "Config":
        """Propagate window-length knobs (L_in/L_out) into the model config and
        validate. Mirrors reference train.py:249-269 derived-config logic."""
        model = dataclasses.replace(
            self.model,
            temporal_seq_len=self.train.L_in,
            prediction_horizon=self.train.L_out,
        )
        model.validate()
        if not 0.0 <= self.train.ema_decay < 1.0:
            raise ValueError(
                f"ema_decay must lie in [0, 1), got {self.train.ema_decay}"
            )
        return dataclasses.replace(self, model=model)

    # ---- JSON round-trip so train/eval/bench share one file ----

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        def build(dc_cls, d):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in d.items():
                if k not in fields:
                    raise KeyError(f"Unknown config key {k!r} for {dc_cls.__name__}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return dc_cls(**kwargs)

        return cls(
            model=build(ModelConfig, raw.get("model", {})),
            train=build(TrainConfig, raw.get("train", {})),
            data=build(DataConfig, raw.get("data", {})),
        )


def scale_up_config() -> Config:
    """The reference's 4-GPU preset (scripts/train_with_dynamic_naming.sh:3-11):
    L_in=336, stride 3, 6 LLM layers, effective batch 8 per replica, lr 5e-5.
    336/4 = 84 latent steps -> 21 patches of 4.

    Effective batch 8 comes from B=1 x accum 8 WITHOUT remat: the r3 interleaved
    A/B measured 3.03 w/s/chip vs 2.34 for the previous B=2 + full-remat policy
    (+29%) at identical update semantics — accumulation trades activation
    residency for step count without remat's recompute tax. (Selective-remat
    `dots_saveable` could not be measured: it reproducibly crashes the remote
    TPU compile service; the policy plumbing stays available via remat_policy.)"""
    model = ModelConfig(llm_layers=6)
    train = TrainConfig(
        L_in=336, train_stride=3, batch_size=1, lr=5e-5, accumulation_steps=8,
        remat_llm=False, eval_batch_size=4,
    )
    return Config(model=model, train=train).resolved()


def long_horizon_config() -> Config:
    """BASELINE.json config 4: L_in=96 -> L_out=24 with a denser 300 km graph
    (~2x edges). 96/4 = 24 latent steps -> 6 patches."""
    train = TrainConfig(L_in=96, L_out=24)
    data = DataConfig(horizon=24, distance_threshold_km=300.0)
    return Config(train=train, data=data).resolved()


def scaled_backbone_config() -> Config:
    """BASELINE.json config 5: 6-layer GPT-2-medium-width LoRA backbone
    (d_llm=1024, 16 heads) for the full-year autoregressive rollout eval."""
    model = ModelConfig(d_llm=1024, llm_heads=16, llm_layers=6)
    train = TrainConfig(L_in=48, L_out=12, batch_size=4)
    return Config(model=model, train=train).resolved()


def operational_config() -> Config:
    """Operational distribution-shift preset: everything the round-3 A/Bs
    proved for deployment across solar-cycle shift, bundled (BASELINE.md
    "RevIN under distribution shift", quantile r3k, stride regimes):

      * revin            — flips the shifted solar-cycle arena from losing to
                           HA by 10% to beating it by 10.9% MAE (the unseen
                           activity level moves into the per-window affine);
      * quantiles         — 0.1/0.5/0.9 probabilistic bands for operations;
                           calibrate with `test.py --conformal fit` (split-
                           conformal offsets, evaluation/conformal.py);
      * stride 1          — the learning regime; the reference's stride-12
                           default phase-locks and memorizes (DESIGN §15);
      * val_tail_frac 0.3 — select checkpoints on the chronologically last
                           30% of val: full-period val RANKED SHIFTED ARMS
                           BACKWARDS in round 3.

    Precedent: the reference ships regime presets as launch scripts
    (train_2gpu.sh:3-12, train_with_dynamic_naming.sh:3-24)."""
    model = ModelConfig(revin=True, quantiles=(0.1, 0.5, 0.9))
    train = TrainConfig(
        train_stride=1, batch_size=8, accumulation_steps=1, val_tail_frac=0.3,
    )
    return Config(model=model, train=train).resolved()


PRESETS = {
    "default": lambda: Config().resolved(),
    "scale_up": scale_up_config,
    "long_horizon": long_horizon_config,
    "scaled_backbone": scaled_backbone_config,
    "operational": operational_config,
}


def load_config(name_or_path: str) -> Config:
    """Resolve a --config value: a preset name from PRESETS, else a json path."""
    if name_or_path in PRESETS:
        return PRESETS[name_or_path]()
    with open(name_or_path) as f:
        return Config.from_json(f.read())


def tiny_config(
    grid_h: int = 6,
    grid_w: int = 8,
    L_in: int = 16,
    L_out: int = 4,
    d_llm: int = 64,
    llm_heads: int = 4,
    llm_layers: int = 2,
) -> Config:
    """A CPU-runnable miniature of the full architecture for tests and dry runs."""
    model = ModelConfig(
        num_nodes=grid_h * grid_w,
        grid_h=grid_h,
        grid_w=grid_w,
        d_emb=16,
        d_llm=d_llm,
        llm_heads=llm_heads,
        llm_layers=llm_layers,
        lora_r=4,
        lora_alpha=8,
        temporal_seq_len=L_in,
        prediction_horizon=L_out,
    )
    train = TrainConfig(L_in=L_in, L_out=L_out, batch_size=2, accumulation_steps=2)
    data = DataConfig(horizon=L_out)
    return Config(model=model, train=train, data=data).resolved()

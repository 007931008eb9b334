"""Typed configuration — the single source of truth for every experiment.

The reference spreads configuration across duplicated module-level constant
blocks with *divergent values* (reference `train_constants.py:6-28` vs
`sed.py:24-42`: conv 16 vs 128, dropout .4 vs .5, GRU 16+8 vs 32x2). Here each
experiment is one immutable dataclass tree, and the reference's three model
generations are captured as presets:

* ``sednet-dcase``   — legacy DCASE 2017 SEDnet (reference `README.md:29-44`,
  architecture diagram): 256-frame sequences, mel-axis pooling 5/2/2,
  2x biGRU(32), time-distributed dense head, multi-label sigmoid.
* ``timepooled-v1``  — reference `sed.py:82-112`: conv 128, dropout 0.5 per
  block, one 2-layer biGRU(32), Linear(64->1), BCE loss.
* ``timepooled-v2``  — reference `crnn_lightning.py:41-73` +
  `train_constants.py:24-28`: conv 16, trailing dropout 0.4, biGRU(16) then
  biGRU(8), Dense 8 + ReLU, Dense 1, focal BCE, plateau LR schedule.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Log-mel frontend parameters (reference `feature.py:29-32, 55-59`)."""

    sample_rate: int = 44_100
    n_fft: int = 2048
    hop_length: int = 1024          # 50% overlap
    n_mels: int = 40
    fmin: float = 0.0
    fmax: Optional[float] = None    # None -> sr / 2
    # librosa-0.7 defaults used by the reference: centered frames with
    # reflect padding, periodic Hann, slaney-normalized HTK=False mel fb.
    center: bool = True
    # The reference takes log with NO epsilon (`feature.py:59`); log_floor
    # None reproduces that (log(0) = -inf). Set e.g. 1e-30 for a safe floor.
    log_floor: Optional[float] = None
    # "fft": XLA rfft path. "matmul": windowed-DFT-as-GEMM path (MXU).
    # "pallas": fused Pallas kernel over the GEMM formulation.
    backend: str = "fft"
    dtype: str = "float32"

    @property
    def fmax_hz(self) -> float:
        return float(self.sample_rate) / 2.0 if self.fmax is None else self.fmax

    @property
    def frames_per_second(self) -> int:
        return int(self.sample_rate / self.hop_length)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """CRNN architecture description covering all three reference models."""

    name: str = "timepooled_v1"
    n_mels: int = 40
    seq_len_in: int = 64
    n_classes: int = 1
    in_channels: int = 1            # 1 mono, 2 binaural (sednet multichannel)
    # Conv trunk: one entry per block.
    conv_channels: Sequence[int] = (128, 128, 128)
    kernel_size: Tuple[int, int] = (3, 3)
    # Pooling per block: sednet pools the MEL axis (5,2,2); timepooled
    # variants pool the TIME axis (2,2,2).
    pool: Sequence[int] = (2, 2, 2)
    pool_axis: str = "time"         # "time" | "mel"
    dropout: float = 0.5
    dropout_per_block: bool = True  # v1: after every block; v2: trailing only
    # Recurrent stack: hidden sizes of successive bidirectional GRUs.
    gru_hidden: Sequence[int] = (32, 32)
    # r/z gate nonlinearity: "sigmoid" (torch/cuDNN) or "hard_sigmoid" (the
    # keras-2.2.4 default recurrent_activation). The sednet preset keeps
    # "sigmoid" — the published architecture specifies tanh units and the
    # diagram is silent on gate activations — but exact keras-2.2.4
    # default-config cell numerics are available (and oracle-tested) via
    # "hard_sigmoid".
    gru_gate_activation: str = "sigmoid"
    # GRU recurrence backend: "auto" picks the Pallas single-kernel
    # recurrence (ops/pallas/gru_scan.py) on TPU when the sequence is long
    # enough for while-loop step dispatch to matter, the XLA lax.scan
    # otherwise; "xla"/"pallas" force a choice.
    gru_backend: str = "auto"
    # v1 uses one torch-style stacked GRU (layer2 input = 2*H of layer1);
    # functionally identical to successive biGRUs when sizes are equal.
    # Head: dense widths applied time-distributed; last layer has no
    # activation (logits). sednet: (16, n_classes); v1: (1,); v2: (8, 1).
    head_dims: Sequence[int] = (1,)
    head_activation: str = "none"   # activation between head layers
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    # Weight init follows the reference generation the preset mirrors:
    # "torch" (uniform fan-in, sed.py/Lightning lineage) or "keras"
    # (glorot kernels + orthogonal recurrent + zero bias, the keras-2.2
    # SEDnet lineage). The orthogonal recurrent kernel measurably speeds
    # SEDnet convergence (scripts/parity_sednet_keras.py), so this is a
    # dynamics-parity knob, not a cosmetic one.
    init_scheme: str = "torch"
    dtype: str = "float32"          # parameter dtype
    compute_dtype: str = "float32"  # activation dtype (bfloat16 for speed)
    # Rematerialize the conv trunk in the backward pass (`jax.checkpoint`):
    # trades ~1/3 extra trunk FLOPs for not holding the three
    # (B, 40, 256, 128) activation tensors through the GRU/head backward —
    # an HBM-pressure knob for large-batch training. Off by default; the
    # measured A/B on the flagship step is in docs/ROADMAP.md
    # (scripts/sednet_remat_ab.py).
    remat_trunk: bool = False

    @property
    def seq_len_out(self) -> int:
        if self.pool_axis == "time":
            return self.seq_len_in // math.prod(self.pool)
        return self.seq_len_in

    @property
    def mel_out(self) -> int:
        if self.pool_axis == "mel":
            m = self.n_mels
            for p in self.pool:
                m //= p
            return m
        return self.n_mels


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop parameters (reference `sed.py:34-42,159-160`,
    `train_lightning.py:17-18,32-53`, `crnn_lightning.py:195-200`)."""

    batch_size: int = 128
    max_epochs: int = 200
    # Early stop: break after `patience`+1 consecutive non-improving epochs
    # for v1 (`sed.py:200-202` uses strict `>`), `patience` for v2.
    early_stop_patience: int = 40
    early_stop_strict_greater: bool = True
    learning_rate: float = 1e-3
    weight_decay: float = 0.0       # v2: 1e-4 (L2-into-grad, torch Adam)
    grad_clip_norm: Optional[float] = None  # v2: 1.0
    loss: str = "bce"               # "bce" | "focal"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # ReduceLROnPlateau on val loss (v2): factor .5, patience 10.
    plateau_factor: Optional[float] = None
    plateau_patience: int = 10
    threshold: float = 0.5          # binarization for metrics
    frames_in_1_sec: int = 5        # segment block size fed to metrics
    seed: int = 42
    checkpoint_policy: str = "best"  # "best" | "all" (v2 saves every epoch)
    k_folds: int = 4
    spec_augment: bool = False      # v2 trains with SpecAugment masking
    plot_every: int = 1             # epochs between artifact plots (0 = off)
    # "balanced": pos/neg window resampling (the hit-detection pipelines);
    # "sequence": full-sweep aligned sequences (the legacy DCASE pipeline).
    sampler: str = "balanced"
    # Validation mode: None defaults per sampler — "sequence" evaluates the
    # FULL val split deterministically every epoch (reference
    # `sed.py:169-176`), "balanced" validates by balanced resampling
    # (reference `sed.py:151-152`). Set True/False to override.
    val_full_sweep: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    frontend: FrontendConfig
    model: ModelConfig
    train: TrainConfig

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _timepooled_v1() -> ExperimentConfig:
    return ExperimentConfig(
        name="timepooled-v1",
        frontend=FrontendConfig(),
        model=ModelConfig(
            name="timepooled_v1",
            conv_channels=(128, 128, 128),
            pool=(2, 2, 2),
            pool_axis="time",
            dropout=0.5,
            dropout_per_block=True,
            gru_hidden=(32, 32),
            head_dims=(1,),
        ),
        train=TrainConfig(
            loss="bce",
            early_stop_patience=40,
            early_stop_strict_greater=True,
            weight_decay=0.0,
            grad_clip_norm=None,
            frames_in_1_sec=5,       # FPS_OUT = (44100//1024)//8 = 5
            checkpoint_policy="best",
        ),
    )


def _timepooled_v2() -> ExperimentConfig:
    return ExperimentConfig(
        name="timepooled-v2",
        frontend=FrontendConfig(),
        model=ModelConfig(
            name="timepooled_v2",
            conv_channels=(16, 16, 16),
            pool=(2, 2, 2),
            pool_axis="time",
            dropout=0.4,
            dropout_per_block=False,
            gru_hidden=(16, 8),
            head_dims=(8, 1),
            head_activation="relu",
            # the reference's Lightning stack opts into bf16 matmuls via
            # torch.set_float32_matmul_precision('medium')
            # (`train_lightning.py:15`); the bfloat16 conv trunk is the TPU
            # equivalent (GRU recurrence stays f32 regardless)
            compute_dtype="bfloat16",
        ),
        train=TrainConfig(
            loss="focal",
            early_stop_patience=20,
            early_stop_strict_greater=False,
            weight_decay=1e-4,
            grad_clip_norm=1.0,
            plateau_factor=0.5,
            plateau_patience=10,
            frames_in_1_sec=5,
            checkpoint_policy="all",
            spec_augment=True,
        ),
    )


def _sednet_dcase(
    in_channels: int = 1, n_classes: int = 6, gate_activation: str = "sigmoid"
) -> ExperimentConfig:
    return ExperimentConfig(
        name="sednet-dcase",
        frontend=FrontendConfig(),
        model=ModelConfig(
            name="sednet",
            seq_len_in=256,
            n_classes=n_classes,
            in_channels=in_channels,
            conv_channels=(128, 128, 128),
            pool=(5, 2, 2),
            pool_axis="mel",
            dropout=0.5,
            dropout_per_block=True,
            gru_hidden=(32, 32),
            gru_gate_activation=gate_activation,
            head_dims=(16, n_classes),
            head_activation="none",
            init_scheme="keras",
        ),
        train=TrainConfig(
            loss="bce",
            early_stop_patience=100,
            batch_size=128,
            frames_in_1_sec=43,      # int(44100 / 1024)
            checkpoint_policy="best",
            sampler="sequence",
        ),
    )


PRESETS = {
    "timepooled-v1": _timepooled_v1,
    "timepooled-v2": _timepooled_v2,
    "sednet-dcase": _sednet_dcase,
    "sednet-dcase-binaural": lambda: _sednet_dcase(in_channels=2),
    # The reference diagram's third input contract, bin-mul-mbe (256x40x6):
    # six stacked 40-band feature maps per frame
    # (/root/reference/images/CRNN_SED_DCASE2017_task3.jpg, README.md:29-31).
    # The model/zoo path is channel-generic; this preset pins the shape.
    "sednet-dcase-binmul": lambda: _sednet_dcase(in_channels=6),
    # Exact keras-2.2.4 cell numerics (hard_sigmoid recurrent gates) — the
    # right preset for checkpoints imported from the keras SEDnet lineage
    # via models/transplant.py::load_keras_checkpoint.
    "sednet-dcase-keras": lambda: _sednet_dcase(gate_activation="hard_sigmoid"),
}


def get_preset(name: str, **overrides) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = PRESETS[name]()
    return cfg.replace(**overrides) if overrides else cfg

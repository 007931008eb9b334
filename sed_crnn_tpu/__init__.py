"""sed_crnn_tpu — a TPU-native (JAX/XLA/Pallas) sound-event-detection framework.

A from-scratch rebuild of the capability surface of the `sed-crnn` reference
(DCASE 2017 SEDnet lineage + the "Decorte" hit-detection fork): on-device
log-mel audio frontend, CRNN model zoo, segment-based ER/F1 metrics, balanced
window sampling + SpecAugment, k-fold experiment runner with early stopping,
checkpointing, and data-parallel training over a `jax.sharding.Mesh`.

Designed TPU-first: static shapes, `lax.scan` recurrences, MXU-aligned
matmuls, fused Pallas kernels for the audio frontend hot path, and XLA
collectives (`psum`) for multi-chip scaling.
"""

__version__ = "0.1.0"

from sed_crnn_tpu.core.config import (  # noqa: F401
    FrontendConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
    PRESETS,
    get_preset,
)

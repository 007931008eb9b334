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


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax-heavy modules on
    # `import sed_crnn_tpu` for config-only uses).
    if name == "get_model":
        from sed_crnn_tpu.models import get_model

        return get_model
    if name == "run_experiment":
        from sed_crnn_tpu.train.loop import run_experiment

        return run_experiment
    if name == "run_fold":
        from sed_crnn_tpu.train.loop import run_fold

        return run_fold
    raise AttributeError(f"module 'sed_crnn_tpu' has no attribute {name!r}")

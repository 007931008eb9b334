"""Runtime configuration knobs applied by the CLI entry points.

`use_fast_prng` switches jax's default PRNG from threefry2x32 to the
TPU-native `rbg` generator. Dropout masks and on-device batch sampling
generate tens of millions of random bits per training step; threefry costs
~10 VPU ops per element while rbg uses the hardware generator — measured
32% faster full training steps (6.5 -> 4.5 ms, v1/B=128). Streams are still
deterministic per key, but differ from threefry streams, so the default
stays threefry for library users; apps and bench opt in.

Must be called before any PRNG key is created.

`enable_compilation_cache` points jax's persistent compilation cache at a
directory that survives the process, so the second CLI invocation (every
fold script, every bench run, every serving daemon restart) skips XLA
recompiles of unchanged programs. The reference pays its framework's warmup
on every `python sed.py`; here the flagship epoch program's ~25 s compile is
paid once per machine. Opt out with SEDTPU_COMPILE_CACHE=off (or point the
variable at a different directory).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "sed_crnn_tpu", "xla"
)


def use_fast_prng() -> None:
    jax.config.update("jax_default_prng_impl", "rbg")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the directory in
    use (None when disabled via SEDTPU_COMPILE_CACHE=off/0/none)."""
    path = path or os.environ.get("SEDTPU_COMPILE_CACHE") or _DEFAULT_CACHE
    if path.lower() in ("0", "off", "none"):
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache even fast compiles: CLI runs re-pay every program, and the
        # axon tunnel inflates effective compile latency.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None  # older jax without these knobs: run uncached
    return path


def configure(fast_prng: bool = True, compile_cache: bool = True) -> None:
    if fast_prng:
        use_fast_prng()
    if compile_cache:
        enable_compilation_cache()

"""Probability post-processing before event decoding.

The reference binarizes raw frame probabilities directly
(`/root/reference/sed.py:173-174`); standard DCASE practice additionally
median-filters the probability tracks first, which removes single-frame
spurious activations (and fills single-frame dropouts) before thresholding —
a pure post-processing lever on event-based F1 that costs one tiny
elementwise pass.

`median_smooth` is jit-compatible (static width, fixed shapes): usable both
in the host-side decode path (`apps/infer.py --median`) and inside the
jitted full-split evaluation program (`train/evaluate.py`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def median_smooth(probs, width: int):
    """Per-class running median along the time axis (axis 0).

    ``width`` must be odd; the edges are zero-padded — the semantics of
    `scipy.signal.medfilt`, the filter DCASE baselines use (tested against
    it). ``width <= 1`` is the identity. Accepts (frames,) or
    (frames, classes); numpy in -> numpy out, jax in -> jax out.
    """
    if width <= 1:
        return probs
    if width % 2 == 0:
        raise ValueError(f"median width must be odd, got {width}")
    was_numpy = isinstance(probs, np.ndarray)
    x = jnp.asarray(probs)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    r = width // 2
    xp = jnp.pad(x, ((r, r), (0, 0)))
    stack = jnp.stack([xp[k : k + x.shape[0]] for k in range(width)], axis=0)
    out = jnp.median(stack, axis=0).astype(x.dtype)
    if squeeze:
        out = out[:, 0]
    return np.asarray(out) if was_numpy else out

"""Minimal functional NN layer library: init/apply pairs over plain pytrees.

No external NN framework — layers are tiny dataclasses whose ``init`` returns
(params, state) dicts of `jnp` arrays and whose ``apply`` is a pure function,
so models compose under `jit`, `grad`, `vmap`, and `shard_map` without any
module magic. Initialization follows torch defaults (uniform +-1/sqrt(fan_in))
so parity tests can load torch weights verbatim.

Layout convention is TPU-friendly NHWC (batch, mel, time, channels) with HWIO
convolution weights; the reference's NCHW torch models (`sed.py:82-112`,
`crnn_lightning.py:41-73`) map onto this by transposition.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Ctx:
    """Per-call context threaded through ``apply``: train/eval mode, dropout
    RNG, and the mesh axis name for cross-replica BatchNorm statistics."""

    train: bool = False
    rng: Optional[jax.Array] = None
    axis_name: Optional[str] = None

    def split(self, n: int = 2):
        if self.rng is None:
            return [None] * n
        return list(jax.random.split(self.rng, n))

    def with_rng(self, rng) -> "Ctx":
        return dataclasses.replace(self, rng=rng)


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    """keras default kernel initializer: U(+-sqrt(6/(fan_in+fan_out)))."""
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return _uniform(key, shape, bound, dtype)


@dataclasses.dataclass(frozen=True)
class Dense:
    # init scheme: "torch" (uniform +-1/sqrt(fan_in), the reference
    # `sed.py`/Lightning lineage) or "keras" (glorot kernel, zero bias —
    # the keras-2.2 SEDnet lineage). Training-dynamics parity with each
    # reference generation requires matching ITS init (measured:
    # scripts/parity_sednet_keras.py).
    in_dim: int
    out_dim: int
    init_scheme: str = "torch"

    def init(self, key, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        if self.init_scheme == "keras":
            return {
                "w": glorot_uniform(kw, (self.in_dim, self.out_dim),
                                    self.in_dim, self.out_dim, dtype),
                "b": jnp.zeros((self.out_dim,), dtype),
            }
        bound = 1.0 / jnp.sqrt(self.in_dim)
        return {
            "w": _uniform(kw, (self.in_dim, self.out_dim), bound, dtype),
            "b": _uniform(kb, (self.out_dim,), bound, dtype),
        }

    def apply(self, params, x):
        return jnp.dot(x, params["w"]) + params["b"]


@dataclasses.dataclass(frozen=True)
class Conv2d:
    """2-D convolution, NHWC activations, HWIO weights, SAME padding."""

    in_ch: int
    out_ch: int
    kernel: Tuple[int, int] = (3, 3)
    padding: str = "SAME"
    init_scheme: str = "torch"      # see Dense.init_scheme

    def init(self, key, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        kh, kw_ = self.kernel
        fan_in = self.in_ch * kh * kw_
        if self.init_scheme == "keras":
            fan_out = self.out_ch * kh * kw_
            return {
                "w": glorot_uniform(kw, (kh, kw_, self.in_ch, self.out_ch),
                                    fan_in, fan_out, dtype),
                "b": jnp.zeros((self.out_ch,), dtype),
            }
        bound = 1.0 / jnp.sqrt(fan_in)
        return {
            "w": _uniform(kw, (kh, kw_, self.in_ch, self.out_ch), bound, dtype),
            "b": _uniform(kb, (self.out_ch,), bound, dtype),
        }

    def apply(self, params, x):
        y = jax.lax.conv_general_dilated(
            x,
            params["w"].astype(x.dtype),
            window_strides=(1, 1),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + params["b"].astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class BatchNorm2d:
    """BatchNorm over NHWC channel axis with torch semantics: biased batch
    variance for normalization, unbiased for the running-average update,
    momentum 0.1, eps 1e-5. With ``ctx.axis_name`` set, batch moments are
    `psum`-reduced across the mesh so data-parallel training normalizes with
    global-batch statistics."""

    ch: int
    eps: float = 1e-5
    momentum: float = 0.1

    def init(self, key, dtype=jnp.float32):
        del key
        params = {
            "scale": jnp.ones((self.ch,), dtype),
            "bias": jnp.zeros((self.ch,), dtype),
        }
        state = {
            "mean": jnp.zeros((self.ch,), jnp.float32),
            "var": jnp.ones((self.ch,), jnp.float32),
        }
        return params, state

    def apply(self, params, state, x, ctx: Ctx):
        reduce_axes = tuple(range(x.ndim - 1))  # all but channel
        if ctx.train:
            xf = x.astype(jnp.float32)
            n = jnp.asarray(xf.size // xf.shape[-1], jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(xf * xf, axis=reduce_axes)
            if ctx.axis_name is not None:
                n = jax.lax.psum(n, ctx.axis_name)
                mean = jax.lax.pmean(mean, ctx.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, ctx.axis_name)
            var = jnp.maximum(mean_sq - mean * mean, 0.0)
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state

        inv = jax.lax.rsqrt(var + self.eps) * params["scale"].astype(jnp.float32)
        bias = params["bias"].astype(jnp.float32)
        if x.dtype == jnp.float32:
            y = (x - mean) * inv + bias
        else:
            # Reduced-precision trunk: normalize in the input dtype with the
            # per-channel affine folded to inv/shift (the output is cast to
            # x.dtype either way, so the f32 elementwise round-trip buys no
            # accuracy — it only doubles residual bytes in the backward).
            shift = bias - mean * inv
            y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        return y.astype(x.dtype), new_state


@dataclasses.dataclass(frozen=True)
class Dropout:
    rate: float

    def apply(self, x, ctx: Ctx):
        if not ctx.train or self.rate == 0.0:
            return x
        if ctx.rng is None:
            raise ValueError("Dropout in train mode requires ctx.rng")
        keep = 1.0 - self.rate
        if keep <= 0.0:
            return jnp.zeros_like(x)
        # Bernoulli by integer threshold on raw random words rather than
        # jax.random.bernoulli: the float path generates a u32 word per
        # element, relayouts it, converts to f32 uniforms, compares, and
        # divides — profiled at ~1.1 ms/step across the three v1 blocks.
        # 8-bit words when keep*256 is integral (the 0.5 presets), else
        # 16-bit (granularity 2^-16, 6e-6 absolute for any rate); the
        # compare/scale stay in the input dtype.
        if abs(keep * 256.0 - round(keep * 256.0)) < 1e-9:
            wdtype, scale_bits = jnp.uint8, 256.0
        else:
            wdtype, scale_bits = jnp.uint16, 65536.0
        thresh = wdtype(min(int(round(keep * scale_bits)), int(scale_bits) - 1))
        # Generate the words batch-minor and transpose back: XLA lays these
        # activations out batch-minor on TPU, so the transpose folds into a
        # bitcast and the rng output needs no relayout copy (profiled ~60 us
        # per v1 step). If XLA picks another layout this is merely the same
        # copy in a different place — random bits are layout-agnostic.
        shp = x.shape[1:] + (x.shape[0],)
        perm = (x.ndim - 1,) + tuple(range(x.ndim - 1))
        bits = jnp.transpose(jax.random.bits(ctx.rng, shp, wdtype), perm)
        inv_keep = jnp.asarray(1.0 / keep, x.dtype)
        m = (bits < thresh).astype(x.dtype) * inv_keep
        return x * m


def max_pool2d(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """Non-overlapping max pool over the (H, W) axes of NHWC input
    (stride == window throughout this model family; torch MaxPool2d
    floor-truncates ragged edges, reproduced by slicing).

    The ph == 1 case (every preset: the pooled axis is always W) folds the
    W-axis pool groups into the LANE dimension — ``(W, C) -> (W/pw, pw*C)``
    is a relabeling of contiguous memory, so the max is a chain of
    lane-aligned compares. The naive ``reshape(..., pw, C)`` + ``max`` puts a
    size-pw dim in the SUBLANE position, and its backward materializes the
    eq-mask on that layout at 8x tile padding — measured 1.96 ms vs 0.16 ms
    for this formulation at (128, 40, 64, 128) fwd+bwd on v5e.

    The backward is a custom VJP routing the gradient to the FIRST maximal
    element of each window (torch MaxPool2d convention). jnp.maximum's
    default transpose splits ties via an eq/eq/divide chain — five extra
    full-tensor passes, profiled inside the hot conv-dgrad fusion of the v1
    train step; the argmax-select form removes them."""
    ph, pw = window
    if (ph, pw) == (1, 1):
        return x
    b, h, w, c = x.shape
    x = x[:, : (h // ph) * ph, : (w // pw) * pw, :]
    if ph == 1:
        r = x.reshape(b, h, w // pw, pw * c)
        return _max_pool_lanes(r, pw)
    x = x.reshape(b, h // ph, ph, w // pw, pw, c)
    return x.max(axis=(2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_lanes(r: jnp.ndarray, pw: int) -> jnp.ndarray:
    """Max over ``pw`` contiguous lane-groups: (..., pw*c) -> (..., c)."""
    return _max_pool_lanes_fwd(r, pw)[0]


def _max_pool_lanes_fwd(r, pw):
    c = r.shape[-1] // pw
    y = r[..., :c]
    if pw == 2:
        # one pred residual; strict > keeps the first window element on ties
        other = r[..., c:]
        second = other > y
        return jnp.where(second, other, y), second
    idx = jnp.zeros(y.shape, jnp.uint8)
    for k in range(1, pw):
        s = r[..., k * c : (k + 1) * c]
        better = s > y
        y = jnp.where(better, s, y)
        idx = jnp.where(better, jnp.uint8(k), idx)
    return y, idx


def _max_pool_lanes_bwd(pw, res, g):
    zero = jnp.zeros((), g.dtype)
    if pw == 2:
        second = res
        parts = [jnp.where(second, zero, g), jnp.where(second, g, zero)]
    else:
        idx = res
        parts = [jnp.where(idx == k, g, zero) for k in range(pw)]
    return (jnp.concatenate(parts, axis=-1),)


_max_pool_lanes.defvjp(_max_pool_lanes_fwd, _max_pool_lanes_bwd)

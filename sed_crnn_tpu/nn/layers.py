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
from typing import Optional, Tuple

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


@dataclasses.dataclass(frozen=True)
class Dense:
    in_dim: int
    out_dim: int

    def init(self, key, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
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

    def init(self, key, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        kh, kw_ = self.kernel
        fan_in = self.in_ch * kh * kw_
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
        y = (x.astype(jnp.float32) - mean) * inv + params["bias"].astype(jnp.float32)
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
        mask = jax.random.bernoulli(ctx.rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def max_pool2d(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """Non-overlapping max pool over the (H, W) axes of NHWC input, as a
    reshape + max (stride == window throughout this model family; torch
    MaxPool2d floor-truncates ragged edges, reproduced by slicing)."""
    ph, pw = window
    if (ph, pw) == (1, 1):
        return x
    b, h, w, c = x.shape
    x = x[:, : (h // ph) * ph, : (w // pw) * pw, :]
    x = x.reshape(b, h // ph, ph, w // pw, pw, c)
    return x.max(axis=(2, 4))

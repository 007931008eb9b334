"""The CRNN model family, configuration-driven.

One generic convolutional-recurrent architecture covers all three reference
models (they differ only in widths, pooled axis, and head):

* legacy DCASE 2017 SEDnet (reference `README.md:29-44` + architecture
  diagram): 3x [Conv 128 @3x3 + BN + ReLU + max-pool over the MEL axis
  (5,2,2) + dropout] -> 2x biGRU(32) -> TD dense 16 -> TD dense n_classes,
  frame-level multi-label sigmoid logits over the full 256-frame sequence;
* TimePooledCRNN v1 (reference `sed.py:82-112`): pools the TIME axis
  (2,2,2), conv 128, dropout 0.5 per block, 2-layer biGRU(32), Linear(64->1);
* TimePooledCRNN v2 (reference `crnn_lightning.py:41-73`): conv 16, single
  trailing dropout 0.4, biGRU(16)+biGRU(8), Dense(8)+ReLU, Dense(1).

Internally everything is NHWC with W as the pooled axis; time-distributed
heads are plain dense layers broadcast over the time dimension. Shapes are
fully static (the reference's dummy-forward shape probe, `sed.py:94-99`,
becomes compile-time arithmetic in `ModelConfig`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sed_crnn_tpu.core.config import ModelConfig
from sed_crnn_tpu.nn.gru import BiGRU
from sed_crnn_tpu.nn.layers import BatchNorm2d, Conv2d, Ctx, Dense, Dropout, max_pool2d

Params = Dict[str, Any]
State = Dict[str, Any]

_ACTIVATIONS = {
    "none": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


@dataclasses.dataclass(frozen=True)
class CRNN:
    cfg: ModelConfig

    # ---- static shape arithmetic -------------------------------------
    @property
    def trunk_out_hw(self) -> Tuple[int, int]:
        """(H, W) after the conv trunk; W is the pooled axis."""
        if self.cfg.pool_axis == "time":
            h, w = self.cfg.n_mels, self.cfg.seq_len_in
        else:
            h, w = self.cfg.seq_len_in, self.cfg.n_mels
        for p in self.cfg.pool:
            w //= p
        return h, w

    @property
    def flat_dim(self) -> int:
        """Features fed to the first GRU: channels x non-time spatial dim."""
        h, w = self.trunk_out_hw
        c = self.cfg.conv_channels[-1]
        non_time = h if self.cfg.pool_axis == "time" else w
        return c * non_time

    @property
    def seq_len_out(self) -> int:
        h, w = self.trunk_out_hw
        return w if self.cfg.pool_axis == "time" else h

    # ---- layers ------------------------------------------------------
    def _blocks(self):
        cfg = self.cfg
        blocks = []
        in_ch = cfg.in_channels
        scheme = getattr(cfg, "init_scheme", "torch")
        for out_ch, p in zip(cfg.conv_channels, cfg.pool):
            blocks.append(
                (
                    Conv2d(in_ch, out_ch, cfg.kernel_size, init_scheme=scheme),
                    BatchNorm2d(out_ch, cfg.bn_eps, cfg.bn_momentum),
                    (1, p),
                )
            )
            in_ch = out_ch
        return blocks

    def _grus(self):
        reset_after = self.cfg.name != "sednet"  # legacy keras convention
        backend = getattr(self.cfg, "gru_backend", "auto")
        if backend == "auto":
            # The Pallas recurrence eliminates per-timestep while-loop
            # dispatch; that only matters for long sequences (the 256-frame
            # SEDnet). Short windows (T=8, timepooled) stay on lax.scan,
            # as does every non-TPU backend (interpreted Pallas is for
            # parity tests, not compute).
            long_seq = self.seq_len_out >= 64
            on_tpu = jax.default_backend() == "tpu"
            backend = "pallas" if (long_seq and on_tpu) else "xla"
        scheme = getattr(self.cfg, "init_scheme", "torch")
        grus, in_dim = [], self.flat_dim
        for h in self.cfg.gru_hidden:
            grus.append(
                BiGRU(
                    in_dim,
                    h,
                    reset_after=reset_after,
                    gate_activation=self.cfg.gru_gate_activation,
                    backend=backend,
                    init_scheme=scheme,
                )
            )
            in_dim = 2 * h
        return grus

    def _head(self):
        dims, layers = self.cfg.head_dims, []
        scheme = getattr(self.cfg, "init_scheme", "torch")
        in_dim = 2 * self.cfg.gru_hidden[-1]
        for d in dims:
            layers.append(Dense(in_dim, d, init_scheme=scheme))
            in_dim = d
        return layers

    # ---- init / apply --------------------------------------------------
    def init(self, key) -> Tuple[Params, State]:
        dtype = jnp.dtype(self.cfg.dtype)
        n_blocks = len(self.cfg.conv_channels)
        keys = jax.random.split(key, n_blocks + len(self.cfg.gru_hidden) + len(self.cfg.head_dims))
        ki = iter(keys)

        params: Params = {"conv": [], "bn": [], "gru": [], "head": []}
        state: State = {"bn": []}
        for conv, bn, _pool in self._blocks():
            params["conv"].append(conv.init(next(ki), dtype))
            bn_p, bn_s = bn.init(None, dtype)
            params["bn"].append(bn_p)
            state["bn"].append(bn_s)
        for gru in self._grus():
            params["gru"].append(gru.init(next(ki), dtype))
        for dense in self._head():
            params["head"].append(dense.init(next(ki), dtype))
        return params, state

    def _to_nhwc(self, x: jnp.ndarray) -> jnp.ndarray:
        """Accepts (B, T, F) mono, (B, T, F*nch) channel-stacked features
        (the fold-pack layout for binaural data, reference `utils.py:15-25`
        split_multi_channels contract: channel c occupies features
        [c*F, (c+1)*F)), or (B, C, T, F) pre-split; returns NHWC with
        W = pooled axis."""
        cfg = self.cfg
        if x.ndim == 3:
            if cfg.in_channels > 1:
                b, t, fc = x.shape
                if fc != cfg.in_channels * cfg.n_mels:
                    raise ValueError(
                        f"expected {cfg.in_channels * cfg.n_mels} stacked features "
                        f"for {cfg.in_channels} channels, got {fc}"
                    )
                x = x.reshape(b, t, cfg.in_channels, cfg.n_mels)
                x = jnp.transpose(x, (0, 2, 1, 3))  # (B, C, T, F)
            else:
                x = x[:, None, :, :]  # (B, 1, T, F)
        if x.ndim != 4:
            raise ValueError(f"expected (B,T,F) or (B,C,T,F) input, got {x.shape}")
        if cfg.pool_axis == "time":
            return jnp.transpose(x, (0, 3, 2, 1))  # (B, F, T, C)
        return jnp.transpose(x, (0, 2, 3, 1))      # (B, T, F, C)

    def apply(
        self,
        params: Params,
        state: State,
        x: jnp.ndarray,
        ctx: Ctx = Ctx(),
        rnn_carry: Optional[list] = None,
        carry_at: Optional[int] = None,
    ):
        """Forward pass.

        Returns ``(logits (B, T_out, n_classes), new_state, new_carry)``.
        ``rnn_carry`` is a list of per-GRU hidden-state dicts used by
        streaming inference to chain chunks; pass None for windowed use.
        ``carry_at`` (static GRU-timestep index) makes ``new_carry``'s
        forward states the MID-sequence hidden states at that index instead
        of the final ones — lookahead streaming reads chunk k's carry out of
        the [k, k+1] pair pass without a second conv pass (the GRU output at
        a timestep IS its hidden state, so this is a free slice).
        """
        cfg = self.cfg
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        x = self._to_nhwc(x.astype(compute_dtype))

        drop = Dropout(cfg.dropout)
        rngs = ctx.split(len(cfg.conv_channels) + 1)

        def _trunk(conv_params, bn_params, bn_state_in, x, rngs):
            new_bn_state = []
            for i, (conv, bn, pool) in enumerate(self._blocks()):
                x = conv.apply(conv_params[i], x)
                x, bn_s = bn.apply(bn_params[i], bn_state_in[i], x, ctx)
                new_bn_state.append(bn_s)
                x = jax.nn.relu(x)
                x = max_pool2d(x, pool)
                if cfg.dropout_per_block:
                    x = drop.apply(x, ctx.with_rng(rngs[i]))
            if not cfg.dropout_per_block:
                x = drop.apply(x, ctx.with_rng(rngs[-1]))
            return x, new_bn_state

        trunk = (
            jax.checkpoint(_trunk)
            if getattr(cfg, "remat_trunk", False)
            else _trunk
        )
        x, new_bn_state = trunk(
            params["conv"], params["bn"], state["bn"], x, rngs
        )

        # -> (B, T, feat) matching the reference flatten order [B,T,C,F]
        if cfg.pool_axis == "time":
            x = jnp.transpose(x, (0, 2, 3, 1))  # (B,F,T,C) -> (B,T,C,F)
        else:
            x = jnp.transpose(x, (0, 1, 3, 2))  # (B,T,F,C) -> (B,T,C,F)
        B, T = x.shape[0], x.shape[1]
        # The recurrence always runs in f32: its FLOPs are negligible next to
        # the conv trunk (which may be bfloat16) and carried-state precision
        # compounds over timesteps.
        x = x.reshape(B, T, -1).astype(jnp.float32)

        new_carry = []
        for i, gru in enumerate(self._grus()):
            h0 = None if rnn_carry is None else rnn_carry[i]
            x, h_last = gru.apply(params["gru"][i], x, h0)
            if carry_at is not None:
                h_last = {"fwd": x[:, carry_at, : gru.hidden], "bwd": h_last["bwd"]}
            new_carry.append(h_last)

        act = _ACTIVATIONS[cfg.head_activation]
        head = self._head()
        for i, dense in enumerate(head):
            x = dense.apply(params["head"][i], x)
            if i < len(head) - 1:
                x = act(x)

        return x.astype(jnp.float32), {"bn": new_bn_state}, new_carry


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def model_flops_per_example(model: CRNN) -> int:
    """Rough forward FLOP count (MACs x 2) for throughput accounting."""
    cfg = model.cfg
    if cfg.pool_axis == "time":
        h, w = cfg.n_mels, cfg.seq_len_in
    else:
        h, w = cfg.seq_len_in, cfg.n_mels
    kh, kw = cfg.kernel_size
    flops = 0
    in_ch = cfg.in_channels
    for out_ch, p in zip(cfg.conv_channels, cfg.pool):
        flops += 2 * h * w * in_ch * out_ch * kh * kw
        w //= p
        in_ch = out_ch
    t = model.seq_len_out
    feat = model.flat_dim
    for hdim in cfg.gru_hidden:
        flops += 2 * 2 * t * (feat * 3 * hdim + hdim * 3 * hdim)
        feat = 2 * hdim
    in_dim = 2 * cfg.gru_hidden[-1]
    for d in cfg.head_dims:
        flops += 2 * t * in_dim * d
        in_dim = d
    return flops

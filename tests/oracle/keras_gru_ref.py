"""Numpy oracle of the Keras-2.2.4 GRU cell (``reset_after=False``).

The legacy DCASE SEDnet was trained with keras 2.2.4 (reference
`requirements.txt:1`), whose GRU uses the "reset-before" convention: a single
bias, gate order (z, r, h) in the weight layout, the reset gate applied to the
*hidden state* before the candidate's recurrent matmul, and
``h = z * h_prev + (1 - z) * hh``. Written from the published equations (Cho
et al. 2014 as implemented by the keras-2.2 era API docs), not from keras
source. ``recurrent_activation`` defaults to keras's hard_sigmoid
(``clip(0.2 x + 0.5, 0, 1)``); pass "sigmoid" to oracle-check implementations
that use exact sigmoid gates.
"""

import numpy as np


def _gate(x, kind):
    if kind == "sigmoid":
        return 1.0 / (1.0 + np.exp(-x))
    if kind == "hard_sigmoid":
        return np.clip(0.2 * x + 0.5, 0.0, 1.0)
    raise ValueError(kind)


def keras_gru_forward(
    x: np.ndarray,
    kernel: np.ndarray,
    recurrent_kernel: np.ndarray,
    bias: np.ndarray,
    h0: np.ndarray = None,
    recurrent_activation: str = "hard_sigmoid",
    go_backwards: bool = False,
):
    """x (B, T, D), kernel (D, 3H) cols ordered [z|r|h], recurrent_kernel
    (H, 3H), bias (3H,). Returns (outputs (B, T, H), h_last (B, H)); with
    ``go_backwards`` the input is consumed from the end and the output
    sequence re-reversed to align with time (keras Bidirectional concat
    semantics)."""
    x = np.asarray(x, np.float32)
    B, T, _ = x.shape
    H = recurrent_kernel.shape[0]
    kz, kr, kh = kernel[:, :H], kernel[:, H : 2 * H], kernel[:, 2 * H :]
    rz, rr, rh = (
        recurrent_kernel[:, :H],
        recurrent_kernel[:, H : 2 * H],
        recurrent_kernel[:, 2 * H :],
    )
    bz, br, bh = bias[:H], bias[H : 2 * H], bias[2 * H :]

    h = np.zeros((B, H), np.float32) if h0 is None else np.asarray(h0, np.float32)
    order = range(T - 1, -1, -1) if go_backwards else range(T)
    outs = np.zeros((B, T, H), np.float32)
    for t in order:
        xt = x[:, t]
        z = _gate(xt @ kz + bz + h @ rz, recurrent_activation)
        r = _gate(xt @ kr + br + h @ rr, recurrent_activation)
        hh = np.tanh(xt @ kh + bh + (r * h) @ rh)
        h = z * h + (1.0 - z) * hh
        outs[:, t] = h
    return outs, h


def keras_bigru_forward(x, fwd_weights, bwd_weights, recurrent_activation="hard_sigmoid"):
    """keras Bidirectional(GRU, merge_mode='concat'): forward pass plus a
    go_backwards pass, concatenated on the feature axis. Each weights tuple is
    (kernel, recurrent_kernel, bias)."""
    yf, _ = keras_gru_forward(x, *fwd_weights, recurrent_activation=recurrent_activation)
    yb, _ = keras_gru_forward(
        x, *bwd_weights, recurrent_activation=recurrent_activation, go_backwards=True
    )
    return np.concatenate([yf, yb], axis=-1)

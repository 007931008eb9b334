"""GRU recurrences as `lax.scan`, TPU-first.

The reference relies on cuDNN GRUs (`sed.py:101-102`, single stacked
bidirectional 2-layer GRU; `crnn_lightning.py:61-62`, two successive
bidirectional GRUs). Here the recurrence is expressed the XLA way:

* the input projection for ALL timesteps is hoisted out of the loop as one
  large ``(B*T, in) @ (in, 3H)`` GEMM (MXU-friendly, no per-step small
  matmuls on the input path);
* `lax.scan` carries only the ``(B, H) @ (H, 3H)`` recurrent GEMM;
* the backward direction is the same scan with ``reverse=True`` — no data
  reversal copies.

Gate order is (reset, update, candidate) in torch/cuDNN weight layout, with
``reset_after=True`` semantics (reset gate applied to the *projected* hidden
state, `h_n = tanh(x_n + r * (W_hn h + b_hn))`). ``reset_after=False`` gives
the Keras-2.2-era convention used by the legacy DCASE SEDnet
(`requirements.txt:1` keras==2.2.4), where reset is applied to ``h`` before
the recurrent matmul and there is a single bias. ``gate_activation`` selects
the r/z gate nonlinearity: "sigmoid" (torch/cuDNN and modern keras) or
"hard_sigmoid" (``clip(0.2x + 0.5, 0, 1)`` — the keras-2.2.4 default
``recurrent_activation``; combine with ``reset_after=False`` to reproduce the
legacy SEDnet's exact cell numerics, oracle-tested in
`tests/test_gru_parity.py`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _gate_fn(name: str):
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "hard_sigmoid":
        return lambda v: jnp.clip(0.2 * v + 0.5, 0.0, 1.0)
    raise ValueError(f"unknown gate_activation {name!r}")


@dataclasses.dataclass(frozen=True)
class GRU:
    in_dim: int
    hidden: int
    reset_after: bool = True
    gate_activation: str = "sigmoid"
    unroll: int = 1
    # "xla": lax.scan recurrence (default; best for short sequences).
    # "pallas": single-kernel VMEM-resident recurrence with a custom-VJP
    # backward kernel (ops/pallas/gru_scan.py) — wins when T is large
    # enough that while-loop step dispatch dominates (the 256-frame SEDnet).
    # Falls back to the scan when the residuals would not fit VMEM.
    backend: str = "xla"
    # "torch": uniform +-1/sqrt(H) everywhere (cuDNN/torch convention, the
    # reference sed.py/Lightning lineage). "keras": glorot input kernel,
    # semi-orthogonal recurrent kernel, zero bias (keras defaults — the
    # keras-2.2 SEDnet lineage). Orthogonal recurrent init measurably
    # speeds convergence at SEDnet depth (scripts/parity_sednet_keras.py),
    # so dynamics parity with each reference generation needs ITS scheme.
    init_scheme: str = "torch"

    def init(self, key, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        h3 = 3 * self.hidden

        if self.init_scheme == "keras":
            from sed_crnn_tpu.nn.layers import glorot_uniform

            # keras Orthogonal: QR of a normal draw, sign-fixed by diag(R);
            # rows of the (H, 3H) recurrent kernel come out orthonormal.
            a = jax.random.normal(ks[1], (h3, self.hidden), jnp.float32)
            q, r = jnp.linalg.qr(a)
            q = q * jnp.sign(jnp.diagonal(r))
            params = {
                "wi": glorot_uniform(ks[0], (self.in_dim, h3),
                                     self.in_dim, h3, dtype),
                "wh": q.T.astype(dtype),
                "bi": jnp.zeros((h3,), dtype),
            }
            if self.reset_after:
                params["bh"] = jnp.zeros((h3,), dtype)
            return params

        bound = 1.0 / jnp.sqrt(self.hidden)

        def u(k, shape):
            return jax.random.uniform(k, shape, dtype, minval=-bound, maxval=bound)

        params = {
            "wi": u(ks[0], (self.in_dim, h3)),
            "wh": u(ks[1], (self.hidden, h3)),
            "bi": u(ks[2], (h3,)),
        }
        if self.reset_after:
            params["bh"] = u(ks[3], (h3,))
        return params

    def apply(self, params, x, h0=None, reverse: bool = False):
        """x (B, T, in) -> outputs (B, T, H); returns (outputs, h_last)."""
        B, T, _ = x.shape
        H = self.hidden
        if h0 is None:
            # Derive the zeros from x (zeros_like keeps sharding/varying-axis
            # metadata under shard_map, where a fresh jnp.zeros would not).
            h0 = jnp.broadcast_to(jnp.zeros_like(x[:, 0, :1]), (B, H))

        # One big GEMM for every timestep's input projection.
        xp = jnp.dot(x, params["wi"]) + params["bi"]      # (B, T, 3H)

        if self.backend == "pallas":
            from sed_crnn_tpu.ops.pallas import gru_scan as _pk

            if _pk.fits_vmem(T, B, H, self.reset_after):
                ys, h_last = _pk.gru_scan(
                    xp,
                    params["wh"],
                    params.get("bh"),
                    h0,
                    reset_after=self.reset_after,
                    gate_activation=self.gate_activation,
                    reverse=reverse,
                )
                return ys, h_last
        elif self.backend != "xla":
            raise ValueError(f"unknown GRU backend {self.backend!r}")

        xp = jnp.swapaxes(xp, 0, 1)                       # (T, B, 3H) scan-major
        wh = params["wh"]
        bh = params.get("bh")
        gate = _gate_fn(self.gate_activation)

        def step(h, xt):
            xr, xz, xn = xt[:, :H], xt[:, H : 2 * H], xt[:, 2 * H :]
            if self.reset_after:
                hp = jnp.dot(h, wh) + bh
                hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
                r = gate(xr + hr)
                z = gate(xz + hz)
                n = jnp.tanh(xn + r * hn)
            else:
                hr = jnp.dot(h, wh[:, :H])
                hz = jnp.dot(h, wh[:, H : 2 * H])
                r = gate(xr + hr)
                z = gate(xz + hz)
                n = jnp.tanh(xn + jnp.dot(r * h, wh[:, 2 * H :]))
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        # `unroll` trades while-loop iteration overhead for program size; it
        # does not change the math. Round-1 measured no win at T=8 (v1); the
        # knob exists for the T=256 SEDnet recurrence.
        h_last, ys = jax.lax.scan(step, h0, xp, reverse=reverse, unroll=self.unroll)
        return jnp.swapaxes(ys, 0, 1), h_last             # (B, T, H)


@dataclasses.dataclass(frozen=True)
class BiGRU:
    """Bidirectional GRU; output is [forward ; backward] concat (2H)."""

    in_dim: int
    hidden: int
    reset_after: bool = True
    gate_activation: str = "sigmoid"
    unroll: int = 1
    backend: str = "xla"
    init_scheme: str = "torch"

    @property
    def _cell(self) -> GRU:
        return GRU(
            self.in_dim,
            self.hidden,
            self.reset_after,
            self.gate_activation,
            self.unroll,
            self.backend,
            self.init_scheme,
        )

    def init(self, key, dtype=jnp.float32):
        kf, kb = jax.random.split(key)
        return {"fwd": self._cell.init(kf, dtype), "bwd": self._cell.init(kb, dtype)}

    def apply(self, params, x, h0=None, reverse=None):
        """x (B, T, in) -> (B, T, 2H). ``h0`` optional dict with 'fwd'/'bwd'
        initial states (used by streaming inference to carry state across
        chunks)."""
        del reverse
        h0f = None if h0 is None else h0.get("fwd")
        h0b = None if h0 is None else h0.get("bwd")
        yf, hf = self._cell.apply(params["fwd"], x, h0f, reverse=False)
        yb, hb = self._cell.apply(params["bwd"], x, h0b, reverse=True)
        return jnp.concatenate([yf, yb], axis=-1), {"fwd": hf, "bwd": hb}

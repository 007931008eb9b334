"""Pallas TPU kernel for the GRU time recurrence.

The XLA `lax.scan` path (`nn/gru.py`) pays a while-loop iteration overhead
on every timestep; at the flagship SEDnet shapes (T=256, B=128, H=32 — the
reference's 256-frame training workflow, `/root/reference/README.md:55-58`)
the model runs 4 sequential scans (2 biGRU layers x 2 directions) of 256
tiny `(128,32)@(32,96)` GEMMs per train step, and the grad-of-scan doubles
it. This kernel runs one whole direction's recurrence inside a single
`pallas_call`: every operand is VMEM-resident (this chip has ~128 MB VMEM;
the largest lane-padded residual is ~17 MB at flagship shapes) and time is
a hardware `fori_loop`, eliminating the per-step dispatch overhead.

Split of labor:

* the input projection ``xp = x @ wi + bi`` for ALL timesteps stays outside
  as one large MXU GEMM (exactly as the XLA path hoists it);
* the kernel carries only the recurrent GEMM + gate arithmetic;
* training runs through a `jax.custom_vjp` whose backward pass is a second
  Pallas kernel running the reverse-time recurrence. Gate values (r, z, n —
  plus the projected-hidden candidate ``hn`` for ``reset_after=True``) are
  stored by the forward kernel in one lane-packed residual array rather
  than recomputed (recomputing would repeat the small matmuls serially).

Numerics: the same f32 operations in the same order as
`nn/gru.py::GRU.apply`'s scan body, so outputs match the XLA path to float
reassociation noise; asserted in `tests/test_pallas_gru.py`. Gate
derivatives are algebraic functions of the stored gate OUTPUTS
(sigmoid' = g(1-g); hard_sigmoid' = 0.2 on the open interval), matching
the autodiff of the forward expressions except on the measure-zero clip
boundaries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~128 MB on this chip (v5e); leave headroom for double buffers and
# the compiler's own scratch. Estimates below use 128-lane padded sizes.
VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 80 * 1024 * 1024


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def vmem_bytes_estimate(T: int, B: int, H: int, reset_after: bool) -> int:
    """Upper bound on the backward kernel's VMEM residency (it is the larger
    pass): ys, dys, res, xp-grad out, plus small carries/weights."""
    b8 = -(-B // 8) * 8
    res_lanes = _lanes(4 * H if reset_after else 3 * H)
    per_t = b8 * 4 * (2 * _lanes(H) + res_lanes + _lanes(3 * H))
    return T * per_t + 4 * b8 * 4 * _lanes(3 * H)


def fits_vmem(T: int, B: int, H: int, reset_after: bool) -> bool:
    return vmem_bytes_estimate(T, B, H, reset_after) <= _VMEM_BUDGET


def res_width(reset_after: bool, H: int) -> int:
    """Lane width of the packed residual row: r|z|n, plus the projected
    candidate ``hn`` when ``reset_after`` (stored so the backward kernel
    never recomputes the recurrent matmuls)."""
    return 4 * H if reset_after else 3 * H


def _gate_fn(name: str):
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "hard_sigmoid":
        return lambda v: jnp.clip(0.2 * v + 0.5, 0.0, 1.0)
    raise ValueError(f"unknown gate_activation {name!r}")


def _gate_grad_from_output(name: str, g):
    """d gate / d preactivation, expressed via the gate's output value."""
    if name == "sigmoid":
        return g * (1.0 - g)
    if name == "hard_sigmoid":
        return 0.2 * jnp.where((g > 0.0) & (g < 1.0), 1.0, 0.0)
    raise ValueError(f"unknown gate_activation {name!r}")


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(xp_ref, wh_ref, bh_ref, h0_ref, *out_refs,
                T, H, reverse, reset_after, gate_name, with_res):
    if with_res:
        ys_ref, res_ref, hl_ref = out_refs
    else:
        ys_ref, hl_ref = out_refs
        res_ref = None
    gate = _gate_fn(gate_name)
    wh = wh_ref[:]
    bh = bh_ref[:] if reset_after else None

    def step(i, h):
        t = T - 1 - i if reverse else i
        xr = xp_ref[t, :, :H]
        xz = xp_ref[t, :, H : 2 * H]
        xn = xp_ref[t, :, 2 * H :]
        if reset_after:
            hp = (
                jax.lax.dot_general(
                    h, wh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bh
            )
            r = gate(xr + hp[:, :H])
            z = gate(xz + hp[:, H : 2 * H])
            hn = hp[:, 2 * H :]
            n = jnp.tanh(xn + r * hn)
            if with_res:
                res_ref[t, :, 3 * H :] = hn
        else:
            hrz = jax.lax.dot_general(
                h, wh[:, : 2 * H], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            r = gate(xr + hrz[:, :H])
            z = gate(xz + hrz[:, H:])
            n = jnp.tanh(
                xn
                + jax.lax.dot_general(
                    r * h, wh[:, 2 * H :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        if with_res:
            res_ref[t, :, :H] = r
            res_ref[t, :, H : 2 * H] = z
            res_ref[t, :, 2 * H : 3 * H] = n
        h_new = (1.0 - z) * n + z * h
        ys_ref[t] = h_new
        return h_new

    hl_ref[:] = jax.lax.fori_loop(0, T, step, h0_ref[:])


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(ys_ref, res_ref, wh_ref, h0_ref, dys_ref, dhl_ref,
                dxp_ref, dwh_ref, dbh_ref, dh0_ref,
                *, T, H, reverse, reset_after, gate_name):
    wh = wh_ref[:]
    dwh_ref[:] = jnp.zeros_like(dwh_ref)
    if reset_after:
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    def step(i, dh):
        # reverse-time order of the forward pass
        t = i if reverse else T - 1 - i
        if reverse:
            # forward walked t = T-1 .. 0; predecessor state is ys[t+1]
            h_prev = jnp.where(
                t < T - 1, ys_ref[jnp.minimum(t + 1, T - 1)], h0_ref[:]
            )
        else:
            h_prev = jnp.where(t > 0, ys_ref[jnp.maximum(t - 1, 0)], h0_ref[:])
        r = res_ref[t, :, :H]
        z = res_ref[t, :, H : 2 * H]
        n = res_ref[t, :, 2 * H : 3 * H]
        dht = dys_ref[t] + dh
        da_z = dht * (h_prev - n) * _gate_grad_from_output(gate_name, z)
        da_n = dht * (1.0 - z) * (1.0 - n * n)
        if reset_after:
            hn = res_ref[t, :, 3 * H :]
            da_r = da_n * hn * _gate_grad_from_output(gate_name, r)
            # gradient w.r.t. the projected hidden hp = h_prev @ wh + bh
            dhp = jnp.concatenate([da_r, da_z, da_n * r], axis=-1)
            dh_new = dht * z + jax.lax.dot_general(
                dhp, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwh_ref[:] += jax.lax.dot_general(
                h_prev, dhp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbh_ref[:] += jnp.sum(dhp, axis=0, keepdims=True)
        else:
            drh = jax.lax.dot_general(
                da_n, wh[:, 2 * H :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            da_r = drh * h_prev * _gate_grad_from_output(gate_name, r)
            da_rz = jnp.concatenate([da_r, da_z], axis=-1)
            dh_new = (
                dht * z
                + jax.lax.dot_general(
                    da_rz, wh[:, : 2 * H], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + drh * r
            )
            dwh_ref[:, : 2 * H] += jax.lax.dot_general(
                h_prev, da_rz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwh_ref[:, 2 * H :] += jax.lax.dot_general(
                r * h_prev, da_n, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dxp_ref[t, :, :H] = da_r
        dxp_ref[t, :, H : 2 * H] = da_z
        dxp_ref[t, :, 2 * H :] = da_n
        return dh_new

    dh0_ref[:] = jax.lax.fori_loop(0, T, step, dhl_ref[:])


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gru_scan_tc(xp, wh, bh, h0, reset_after: bool, gate_name: str,
                reverse: bool):
    """Time-major GRU recurrence: ``xp (T,B,3H)`` pre-projected inputs,
    ``wh (H,3H)``, ``bh (1,3H)`` (ignored unless ``reset_after``),
    ``h0 (B,H)`` -> ``(ys (T,B,H), h_last (B,H))``."""
    ys, hl = _fwd_call(xp, wh, bh, h0, reset_after, gate_name, reverse,
                       with_res=False)
    return ys, hl


def _fwd_call(xp, wh, bh, h0, reset_after, gate_name, reverse, with_res):
    T, B, H3 = xp.shape
    H = H3 // 3
    res_w = 4 * H if reset_after else 3 * H
    kern = partial(
        _fwd_kernel, T=T, H=H, reverse=reverse, reset_after=reset_after,
        gate_name=gate_name, with_res=with_res,
    )
    out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
    if with_res:
        out_shape.append(jax.ShapeDtypeStruct((T, B, res_w), jnp.float32))
    out_shape.append(jax.ShapeDtypeStruct((B, H), jnp.float32))
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 3 * H * 2,
            bytes_accessed=4 * T * B * (H3 + H + (res_w if with_res else 0)),
            transcendentals=2 * T * B * H,
        ),
    )(xp, wh, bh, h0)
    return outs


def _gru_fwd(xp, wh, bh, h0, reset_after, gate_name, reverse):
    ys, res, hl = _fwd_call(xp, wh, bh, h0, reset_after, gate_name, reverse,
                            with_res=True)
    return (ys, hl), (ys, res, wh, h0)


def _gru_bwd(reset_after, gate_name, reverse, saved, cot):
    ys, res, wh, h0 = saved
    dys, dhl = cot
    T, B, H = ys.shape
    kern = partial(
        _bwd_kernel, T=T, H=H, reverse=reverse, reset_after=reset_after,
        gate_name=gate_name,
    )
    dxp, dwh, dbh, dh0 = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 3 * H * 4,
            bytes_accessed=4 * T * B * (3 * H + 3 * H + res_width(reset_after, H)),
            transcendentals=0,
        ),
    )(ys, res, wh, h0, dys, dhl)
    if not reset_after:
        dbh = jnp.zeros_like(dbh)
    return dxp, dwh, dbh, dh0


gru_scan_tc.defvjp(_gru_fwd, _gru_bwd)


def gru_scan(xp, wh, bh, h0, *, reset_after: bool, gate_activation: str,
             reverse: bool):
    """Batch-major convenience wrapper: ``xp (B,T,3H)``, ``h0 (B,H)`` ->
    ``(ys (B,T,H), h_last (B,H))``. Pads the batch to a sublane multiple of
    8 when needed."""
    B, T, H3 = xp.shape
    H = H3 // 3
    pad = (-B) % 8
    xp_t = jnp.swapaxes(xp, 0, 1)
    if pad:
        xp_t = jnp.pad(xp_t, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    if bh is None:
        bh = jnp.zeros((1, H3), xp.dtype)
    else:
        bh = bh.reshape(1, H3)
    ys, hl = gru_scan_tc(xp_t, wh, bh, h0, reset_after, gate_activation,
                         reverse)
    ys = jnp.swapaxes(ys, 0, 1)
    if pad:
        ys, hl = ys[:B], hl[:B]
    return ys, hl

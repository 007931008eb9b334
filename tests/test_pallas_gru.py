"""Parity of the Pallas GRU recurrence kernel (`ops/pallas/gru_scan.py`)
against the XLA `lax.scan` path (`nn/gru.py`), forward and backward.

Runs the kernel in interpret mode on the CPU test mesh (same numerics path
as on TPU up to float reassociation); shapes are small so the interpreted
time loop stays fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sed_crnn_tpu.nn.gru import GRU, BiGRU
from sed_crnn_tpu.ops.pallas.gru_scan import fits_vmem, gru_scan

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow

B, T, IN, H = 8, 12, 10, 5


def _params(key, in_dim, hidden, reset_after):
    cell = GRU(in_dim, hidden, reset_after=reset_after)
    return cell.init(key)


@pytest.mark.parametrize("reset_after", [True, False])
@pytest.mark.parametrize("gate", ["sigmoid", "hard_sigmoid"])
@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_scan(reset_after, gate, reverse):
    key = jax.random.PRNGKey(0)
    p = _params(key, IN, H, reset_after)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, IN))
    xla = GRU(IN, H, reset_after, gate)
    pal = GRU(IN, H, reset_after, gate, backend="pallas")
    ys_ref, hl_ref = xla.apply(p, x, reverse=reverse)
    ys, hl = pal.apply(p, x, reverse=reverse)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("reset_after", [True, False])
@pytest.mark.parametrize("gate", ["sigmoid", "hard_sigmoid"])
@pytest.mark.parametrize("reverse", [False, True])
def test_backward_matches_scan(reset_after, gate, reverse):
    key = jax.random.PRNGKey(2)
    p = _params(key, IN, H, reset_after)
    x = jax.random.normal(jax.random.fold_in(key, 3), (B, T, IN))
    h0 = 0.3 * jax.random.normal(jax.random.fold_in(key, 4), (B, H))
    # weight the two outputs so both dys and dh_last cotangents are nonzero
    wy = jax.random.normal(jax.random.fold_in(key, 5), (B, T, H))

    def loss(cell):
        def f(p, x, h0):
            ys, hl = cell.apply(p, x, h0=h0, reverse=reverse)
            return jnp.sum(ys * wy) + jnp.sum(jnp.tanh(hl))

        return f

    xla = GRU(IN, H, reset_after, gate)
    pal = GRU(IN, H, reset_after, gate, backend="pallas")
    g_ref = jax.grad(loss(xla), argnums=(0, 1, 2))(p, x, h0)
    g_pal = jax.grad(loss(pal), argnums=(0, 1, 2))(p, x, h0)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for a, b in zip(flat_pal, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_bigru_pallas_matches_xla_with_carry():
    key = jax.random.PRNGKey(7)
    xla = BiGRU(IN, H, reset_after=False, gate_activation="hard_sigmoid")
    pal = BiGRU(IN, H, reset_after=False, gate_activation="hard_sigmoid",
                backend="pallas")
    p = xla.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, IN))
    h0 = {
        "fwd": 0.2 * jax.random.normal(jax.random.fold_in(key, 2), (B, H)),
        "bwd": 0.2 * jax.random.normal(jax.random.fold_in(key, 3), (B, H)),
    }
    y_ref, c_ref = xla.apply(p, x, h0)
    y, c = pal.apply(p, x, h0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)
    for k in ("fwd", "bwd"):
        np.testing.assert_allclose(np.asarray(c[k]), np.asarray(c_ref[k]),
                                   rtol=1e-6, atol=1e-6)


def test_batch_padding_path():
    """B=5 is not a sublane multiple; the wrapper pads and slices back."""
    key = jax.random.PRNGKey(9)
    p = _params(key, IN, H, True)
    x = jax.random.normal(jax.random.fold_in(key, 1), (5, T, IN))
    xla = GRU(IN, H)
    pal = GRU(IN, H, backend="pallas")
    ys_ref, hl_ref = xla.apply(p, x)
    ys, hl = pal.apply(p, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               rtol=1e-6, atol=1e-6)


def test_vmem_guard_falls_back():
    """Shapes whose residuals exceed the VMEM budget use the scan path (no
    error, same result shapes)."""
    assert not fits_vmem(T=8192, B=512, H=128, reset_after=True)
    assert fits_vmem(T=256, B=128, H=32, reset_after=False)
    cell = GRU(IN, H, backend="pallas")
    p = cell.init(jax.random.PRNGKey(0))
    # tiny shapes fit; just assert the public wrapper runs end to end jitted
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    ys, hl = jax.jit(lambda p, x: cell.apply(p, x))(p, x)
    assert ys.shape == (B, T, H) and hl.shape == (B, H)


def test_unknown_backend_raises():
    cell = GRU(IN, H, backend="cuda")
    p = cell.init(jax.random.PRNGKey(0))
    x = jnp.zeros((B, T, IN))
    with pytest.raises(ValueError, match="backend"):
        cell.apply(p, x)

"""GRU `lax.scan` recurrence vs torch nn.GRU (the reference's cuDNN-semantics
oracle, `sed.py:101`, `crnn_lightning.py:61-62`)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sed_crnn_tpu.nn.gru import GRU, BiGRU


def _torch_gru_params(tg, layer=0, reverse=False, layer_in=None):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "wi": jnp.asarray(getattr(tg, f"weight_ih{sfx}").detach().numpy().T),
        "wh": jnp.asarray(getattr(tg, f"weight_hh{sfx}").detach().numpy().T),
        "bi": jnp.asarray(getattr(tg, f"bias_ih{sfx}").detach().numpy()),
        "bh": jnp.asarray(getattr(tg, f"bias_hh{sfx}").detach().numpy()),
    }


def test_unidirectional_matches_torch(rng):
    torch.manual_seed(0)
    B, T, D, H = 4, 11, 7, 5
    tg = torch.nn.GRU(D, H, batch_first=True)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        ref, ref_h = tg(torch.from_numpy(x))

    cell = GRU(D, H)
    out, h_last = cell.apply(_torch_gru_params(tg), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), ref_h[0].numpy(), atol=1e-5)


def test_bidirectional_matches_torch(rng):
    torch.manual_seed(1)
    B, T, D, H = 3, 8, 6, 4
    tg = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))

    bi = BiGRU(D, H)
    params = {
        "fwd": _torch_gru_params(tg),
        "bwd": _torch_gru_params(tg, reverse=True),
    }
    out, _ = bi.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_stacked_bidirectional_matches_torch(rng):
    """torch GRU(num_layers=2, bidirectional) == two chained BiGRUs
    (the v1 model's recurrent stack, reference `sed.py:101-102`)."""
    torch.manual_seed(2)
    B, T, D, H = 2, 8, 10, 32
    tg = torch.nn.GRU(D, H, num_layers=2, batch_first=True, bidirectional=True)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))

    l1, l2 = BiGRU(D, H), BiGRU(2 * H, H)
    p1 = {"fwd": _torch_gru_params(tg, 0), "bwd": _torch_gru_params(tg, 0, True)}
    p2 = {"fwd": _torch_gru_params(tg, 1), "bwd": _torch_gru_params(tg, 1, True)}
    y, _ = l1.apply(p1, jnp.asarray(x))
    y, _ = l2.apply(p2, y)
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_initial_state_carry(rng):
    """Carrying h0 across chunks must equal one long forward (the basis of
    streaming long-file inference for unidirectional scans)."""
    cell = GRU(5, 9)
    import jax

    params = cell.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 20, 5)).astype(np.float32))
    full, _ = cell.apply(params, x)
    a, h = cell.apply(params, x[:, :12])
    b, _ = cell.apply(params, x[:, 12:], h0=h)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([a, b], axis=1)), np.asarray(full), atol=1e-6
    )


def test_keras_convention_reset_before(rng):
    """reset_after=False (legacy SEDnet keras-2.2 convention) differs from the
    torch convention and runs/initializes cleanly."""
    import jax

    cell = GRU(6, 4, reset_after=False)
    params = cell.init(jax.random.PRNGKey(3))
    assert "bh" not in params
    x = jnp.asarray(rng.standard_normal((2, 7, 6)).astype(np.float32))
    out, h = cell.apply(params, x)
    assert out.shape == (2, 7, 4) and h.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


# ---------------- keras-2.2.4 numerical oracle ----------------
# The legacy SEDnet's recurrence (reference `requirements.txt:1`,
# keras==2.2.4): reset-before, single bias, gate order (z, r, h).

from tests.oracle.keras_gru_ref import keras_bigru_forward, keras_gru_forward


def _keras_weights(rng, D, H):
    """(kernel (D,3H) [z|r|h], recurrent_kernel (H,3H), bias (3H,))."""
    return (
        rng.uniform(-0.4, 0.4, (D, 3 * H)).astype(np.float32),
        rng.uniform(-0.4, 0.4, (H, 3 * H)).astype(np.float32),
        rng.uniform(-0.1, 0.1, (3 * H,)).astype(np.float32),
    )


def _transplant(kernel, recurrent_kernel, bias):
    """keras [z|r|h] column order -> this framework's (r, z, n) layout."""
    H = recurrent_kernel.shape[0]

    def reorder(w):
        return np.concatenate([w[..., H : 2 * H], w[..., :H], w[..., 2 * H :]], axis=-1)

    return {
        "wi": jnp.asarray(reorder(kernel)),
        "wh": jnp.asarray(reorder(recurrent_kernel)),
        "bi": jnp.asarray(reorder(bias)),
    }


@pytest.mark.parametrize("gate", ["sigmoid", "hard_sigmoid"])
def test_keras_transplant_matches_oracle(rng, gate):
    """reset_after=False transplant parity at <=1e-5, both gate conventions
    (hard_sigmoid is the keras-2.2.4 default recurrent_activation)."""
    B, T, D, H = 3, 13, 7, 5
    kw = _keras_weights(rng, D, H)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    ref, ref_h = keras_gru_forward(x, *kw, recurrent_activation=gate)

    cell = GRU(D, H, reset_after=False, gate_activation=gate)
    out, h_last = cell.apply(_transplant(*kw), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), ref_h, atol=1e-5)

    # reversed direction: scan(reverse=True) == keras go_backwards + re-reverse
    ref_b, _ = keras_gru_forward(x, *kw, recurrent_activation=gate, go_backwards=True)
    out_b, _ = cell.apply(_transplant(*kw), jnp.asarray(x), reverse=True)
    np.testing.assert_allclose(np.asarray(out_b), ref_b, atol=1e-5)


@pytest.mark.parametrize("gate", ["sigmoid", "hard_sigmoid"])
def test_keras_bidirectional_transplant_matches_oracle(rng, gate):
    """Bidirectional concat semantics vs the keras oracle — the flagship
    SEDnet's biGRU(32) stack shape (reference diagram, 2x biGRU tanh)."""
    B, T, D, H = 2, 16, 10, 32
    kwf = _keras_weights(rng, D, H)
    kwb = _keras_weights(rng, D, H)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    ref = keras_bigru_forward(x, kwf, kwb, recurrent_activation=gate)

    bi = BiGRU(D, H, reset_after=False, gate_activation=gate)
    params = {"fwd": _transplant(*kwf), "bwd": _transplant(*kwb)}
    out, _ = bi.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

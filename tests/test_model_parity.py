"""End-to-end model parity: CRNN presets vs torch reconstructions of the
reference architectures (`sed.py:82-112` v1, `crnn_lightning.py:41-73` v2),
weights transplanted, eval mode."""

import numpy as np
import torch
from torch import nn

import jax
import jax.numpy as jnp

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import count_params, get_model
from sed_crnn_tpu.nn.layers import Ctx


class TorchV1(nn.Module):
    """Reconstruction of the reference v1 TimePooledCRNN contract:
    3x [Conv2d(->128, 3x3) + BN + ReLU + MaxPool(1,2) + Dropout] over
    (B,1,40,64), then 2-layer biGRU(32) and Linear(64->1)."""

    def __init__(self):
        super().__init__()
        chans = [1, 128, 128, 128]
        self.convs = nn.ModuleList(
            nn.Conv2d(chans[i], chans[i + 1], 3, padding=1) for i in range(3)
        )
        self.bns = nn.ModuleList(nn.BatchNorm2d(128) for _ in range(3))
        self.gru = nn.GRU(128 * 40, 32, num_layers=2, batch_first=True, bidirectional=True)
        self.fc = nn.Linear(64, 1)

    def forward(self, x):
        for conv, bn in zip(self.convs, self.bns):
            x = nn.functional.max_pool2d(torch.relu(bn(conv(x))), (1, 2))
        x = x.permute(0, 3, 1, 2)
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x, _ = self.gru(x)
        return self.fc(x)


class TorchV2(nn.Module):
    """Reconstruction of the reference v2 contract: conv depth 16, trailing
    dropout, biGRU(16)+biGRU(8), Dense(8)+ReLU, Dense(1)."""

    def __init__(self):
        super().__init__()
        chans = [1, 16, 16, 16]
        self.convs = nn.ModuleList(
            nn.Conv2d(chans[i], chans[i + 1], 3, padding=1) for i in range(3)
        )
        self.bns = nn.ModuleList(nn.BatchNorm2d(16) for _ in range(3))
        self.gru1 = nn.GRU(16 * 40, 16, batch_first=True, bidirectional=True)
        self.gru2 = nn.GRU(32, 8, batch_first=True, bidirectional=True)
        self.d1 = nn.Linear(16, 8)
        self.d2 = nn.Linear(8, 1)

    def forward(self, x):
        for conv, bn in zip(self.convs, self.bns):
            x = nn.functional.max_pool2d(torch.relu(bn(conv(x))), (1, 2))
        x = x.permute(0, 3, 1, 2)
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x, _ = self.gru1(x)
        x, _ = self.gru2(x)
        return self.d2(torch.relu(self.d1(x)))


def _np(t):
    return t.detach().numpy()


def _gru_dir(tg, layer, reverse):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "wi": jnp.asarray(_np(getattr(tg, f"weight_ih{sfx}")).T),
        "wh": jnp.asarray(_np(getattr(tg, f"weight_hh{sfx}")).T),
        "bi": jnp.asarray(_np(getattr(tg, f"bias_ih{sfx}"))),
        "bh": jnp.asarray(_np(getattr(tg, f"bias_hh{sfx}"))),
    }


def _transplant(tmodel, grus):
    """Map torch weights into CRNN param/state pytrees. ``grus`` is a list of
    (torch_gru_module, torch_layer_index) per BiGRU."""
    params = {"conv": [], "bn": [], "gru": [], "head": []}
    state = {"bn": []}
    for conv, bn in zip(tmodel.convs, tmodel.bns):
        params["conv"].append(
            {
                "w": jnp.asarray(_np(conv.weight).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(_np(conv.bias)),
            }
        )
        params["bn"].append(
            {"scale": jnp.asarray(_np(bn.weight)), "bias": jnp.asarray(_np(bn.bias))}
        )
        state["bn"].append(
            {
                "mean": jnp.asarray(_np(bn.running_mean)),
                "var": jnp.asarray(_np(bn.running_var)),
            }
        )
    for tg, layer in grus:
        params["gru"].append(
            {"fwd": _gru_dir(tg, layer, False), "bwd": _gru_dir(tg, layer, True)}
        )
    return params, state


def _head_params(linears):
    return [
        {"w": jnp.asarray(_np(l.weight).T), "b": jnp.asarray(_np(l.bias))}
        for l in linears
    ]


def _prime_bn_stats(tmodel, rng):
    """Run a few train-mode batches so BN running stats are non-trivial."""
    tmodel.train()
    with torch.no_grad():
        for _ in range(3):
            tmodel(torch.from_numpy(rng.standard_normal((8, 1, 40, 64)).astype(np.float32)))
    tmodel.eval()


def test_v1_parity(rng):
    torch.manual_seed(0)
    tm = TorchV1()
    _prime_bn_stats(tm, rng)

    model = get_model("timepooled-v1")
    params, state = _transplant(tm, [(tm.gru, 0), (tm.gru, 1)])
    params["head"] = _head_params([tm.fc])

    x = rng.standard_normal((5, 64, 40)).astype(np.float32)  # (B, T, F)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()  # (B,1,40,64)

    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    assert logits.shape == (5, 8, 1)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_v2_parity(rng):
    import dataclasses

    torch.manual_seed(1)
    tm = TorchV2()
    _prime_bn_stats(tm, rng)

    # pin f32 compute for exact torch comparison (the preset defaults to a
    # bfloat16 trunk, mirroring the reference's 'medium' matmul precision)
    cfg = get_preset("timepooled-v2").model
    model = get_model(dataclasses.replace(cfg, compute_dtype="float32"))
    params, state = _transplant(tm, [(tm.gru1, 0), (tm.gru2, 0)])
    params["head"] = _head_params([tm.d1, tm.d2])

    x = rng.standard_normal((3, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()

    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    assert logits.shape == (3, 8, 1)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_sednet_shapes_and_grad():
    """Legacy SEDnet contract: (B, 256, 40) mono / (B, 2, 256, 40) binaural
    -> (B, 256, 6) frame-level logits; trainable end to end."""
    model = get_model("sednet-dcase")
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 256, 40))
    logits, _, _ = model.apply(params, state, x, Ctx(train=False))
    assert logits.shape == (2, 256, 6)

    bin_model = get_model("sednet-dcase-binaural")
    bp, bs = bin_model.init(jax.random.PRNGKey(1))
    xb = jnp.ones((2, 2, 256, 40))
    logits_b, _, _ = bin_model.apply(bp, bs, xb, Ctx(train=False))
    assert logits_b.shape == (2, 256, 6)

    def loss_fn(p):
        out, _, _ = model.apply(p, state, x, Ctx(train=False))
        return jnp.mean(out**2)

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_param_counts_match_torch():
    tm1, tm2 = TorchV1(), TorchV2()
    m1, m2 = get_model("timepooled-v1"), get_model("timepooled-v2")
    p1, _ = m1.init(jax.random.PRNGKey(0))
    p2, _ = m2.init(jax.random.PRNGKey(0))
    t1 = sum(p.numel() for p in tm1.parameters())
    t2 = sum(p.numel() for p in tm2.parameters())
    assert count_params(p1) == t1
    assert count_params(p2) == t2


def test_streaming_carry_changes_output():
    """rnn_carry is accepted and propagates (full streaming equivalence is
    exercised in the GRU-level test; windows here are conv-independent)."""
    model = get_model("timepooled-v2")
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 40))
    _, _, carry = model.apply(params, state, x, Ctx(train=False))
    assert len(carry) == 2
    logits2, _, _ = model.apply(params, state, x, Ctx(train=False), rnn_carry=carry)
    assert logits2.shape == (1, 8, 1)

"""End-to-end model parity: CRNN presets vs torch reconstructions of the
reference architectures (`sed.py:82-112` v1, `crnn_lightning.py:41-73` v2),
weights transplanted, eval mode."""

import pytest
import numpy as np
import torch
from torch import nn

import jax
import jax.numpy as jnp

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import count_params, get_model
from sed_crnn_tpu.models.transplant import params_from_torch_state_dict
from sed_crnn_tpu.nn.layers import Ctx

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


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


# Weight mapping lives in the package (`models/transplant.py`); these tests
# pin its numerical parity by feeding real torch state_dicts through it.


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
    params, state = params_from_torch_state_dict(model.cfg, tm.state_dict())

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
    params, state = params_from_torch_state_dict(model.cfg, tm.state_dict())

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

    # bin-mul-mbe (256x40x6), the diagram's third input contract
    mul_model = get_model("sednet-dcase-binmul")
    mp, ms = mul_model.init(jax.random.PRNGKey(2))
    xm = jnp.ones((2, 6, 256, 40))
    logits_m, _, _ = mul_model.apply(mp, ms, xm, Ctx(train=False))
    assert logits_m.shape == (2, 256, 6)

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


def test_import_torch_checkpoint_app(tmp_path, rng):
    """Full migration path: Lightning-style .ckpt on disk -> import CLI ->
    framework npz -> identical forward outputs."""
    import dataclasses

    from sed_crnn_tpu.apps.import_torch import import_checkpoint
    from sed_crnn_tpu.core import checkpoint as ckpt_io

    torch.manual_seed(3)
    tm = TorchV2()
    _prime_bn_stats(tm, rng)
    ckpt = tmp_path / "lightning.ckpt"
    # Lightning wraps the state_dict and prefixes module names with "model."
    torch.save(
        {"state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()}},
        ckpt,
    )

    out = import_checkpoint(str(ckpt), "timepooled-v2", str(tmp_path / "imported.npz"))
    tree, meta = ckpt_io.load_checkpoint(out)
    assert meta["preset"] == "timepooled-v2" and meta["epoch"] == 0

    cfg = dataclasses.replace(get_preset("timepooled-v2").model, compute_dtype="float32")
    model = get_model(cfg)
    x = rng.standard_normal((3, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()
    logits, _, _ = model.apply(
        tree["params"], tree["model_state"], jnp.asarray(x), Ctx(train=False)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_import_rejects_mismatched_preset(rng):
    """A v2 checkpoint against the v1 config must fail loudly, not garble."""
    torch.manual_seed(4)
    tm = TorchV2()
    with pytest.raises(ValueError):
        params_from_torch_state_dict(
            get_model("timepooled-v1").cfg, tm.state_dict()
        )


def test_import_rejects_sednet_presets():
    """torch GRU weights encode cuDNN reset_after semantics; mapping them
    onto the keras-cell sednet presets must fail loudly."""
    torch.manual_seed(5)
    tm = TorchV1()
    with pytest.raises(ValueError, match="keras"):
        params_from_torch_state_dict(get_model("sednet-dcase").cfg, tm.state_dict())


def test_import_full_lightning_checkpoint_with_hparams(tmp_path, rng):
    """Real Lightning checkpoints carry pickled hyper_parameters objects the
    weights-only unpickler rejects; the loader must fall back and import."""
    import argparse
    import dataclasses

    from sed_crnn_tpu.models.transplant import load_torch_checkpoint

    torch.manual_seed(6)
    tm = TorchV2()
    _prime_bn_stats(tm, rng)
    ckpt = tmp_path / "full_lightning.ckpt"
    torch.save(
        {
            "state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()},
            "hyper_parameters": argparse.Namespace(lr=1e-3, fold_id=1),
            "epoch": 17,
        },
        ckpt,
    )
    cfg = dataclasses.replace(get_preset("timepooled-v2").model, compute_dtype="float32")
    params, state = load_torch_checkpoint(str(ckpt), cfg)
    model = get_model(cfg)
    x = rng.standard_normal((2, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)

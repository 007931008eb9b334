"""Cross-framework TRAINING-DYNAMICS parity (docs/PARITY.md §training-dynamics).

Single-step math parity (weight-transplant tests in `test_model_parity.py`)
does not prove the *training loop* reproduces the reference's behavior. The
DCASE 2017 corpus behind the published ER 0.60 / F1 0.57 numbers
(reference `README.md:60-67`) is not available in this environment, so this
harness is the best available proxy: train the SAME v1-shaped architecture
(reference `sed.py:82-112` — per-block dropout, 2-layer stacked biGRU, BCE,
Adam lr 1e-3) with this framework and with an inline torch reconstruction of
the reference trainer (`sed.py:128-210` — balanced pos/neg window epochs of
2x#positives draws), on identical synthetic folds, then evaluate BOTH
deterministically over the full val split and require the converged ER/F1 to
agree within a tolerance band.

Widths are scaled (conv 16, GRU 16 — the full conv-128 v1 is ~60x these conv
FLOPs, prohibitive on the single-core CPU test runner); the architecture
family, loss, optimizer, sampling law, and epoch structure are the
reference's. Band: |dER| <= 0.2, |dF1| <= 0.2, both frameworks reaching
ER < 0.7 on a strongly separable task.
"""

import dataclasses

import numpy as np
import torch
from torch import nn

import jax

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import rasterize
from sed_crnn_tpu.data.sampler import find_clean_negative_starts
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.train.evaluate import window_split
from sed_crnn_tpu.train.loop import Trainer, make_samplers
from tests.oracle.metrics_ref import ref_er_1sec, ref_f1_1sec

import pytest

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow

SEQ, POOL_OUT, BATCH, EPOCHS, BLOCK = 64, 8, 32, 6, 5


def _fold(rng, frames):
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events, t = [], 2.0
    while t * 43 < frames - 100:
        events.append((t, t + rng.uniform(0.2, 0.5)))
        t += rng.uniform(2.5, 4.0)
    lab = rasterize.rasterize_events(events, frames, 44100, 1024)
    mel[lab[:, 0] == 1, 8:16] += 4.0
    return mel, lab


class TorchV1Scaled(nn.Module):
    """The reference v1 architecture (`sed.py:82-112`) at conv 16 / GRU 16."""

    def __init__(self, width=16, hidden=16):
        super().__init__()
        chans = [1, width, width, width]
        self.convs = nn.ModuleList(
            nn.Conv2d(chans[i], chans[i + 1], 3, padding=1) for i in range(3)
        )
        self.bns = nn.ModuleList(nn.BatchNorm2d(width) for _ in range(3))
        self.drop = nn.Dropout(0.5)
        self.gru = nn.GRU(
            width * 40, hidden, num_layers=2, batch_first=True, bidirectional=True
        )
        self.fc = nn.Linear(2 * hidden, 1)

    def forward(self, x):
        for conv, bn in zip(self.convs, self.bns):
            x = self.drop(nn.functional.max_pool2d(torch.relu(bn(conv(x))), (1, 2)))
        x = x.permute(0, 3, 1, 2)
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x, _ = self.gru(x)
        return self.fc(x)


def _torch_batches(rngnp, mel, lab, steps):
    """The reference sampler's law (`sed.py:48-79`): even index = random
    window containing a random positive frame, odd = clean-negative start;
    labels max-pooled 64 -> 8."""
    pos = np.flatnonzero(lab[:, 0] > 0)
    neg = find_clean_negative_starts(lab, SEQ)
    total = lab.shape[0]
    for _ in range(steps):
        starts = np.empty(BATCH, np.int64)
        for i in range(BATCH):
            if i % 2 == 0:
                c = pos[rngnp.integers(len(pos))]
                lo = max(0, c - SEQ + 1)
                hi = max(min(c, total - SEQ), lo)
                starts[i] = rngnp.integers(lo, hi + 1)
            else:
                starts[i] = neg[rngnp.integers(len(neg))]
        idx = starts[:, None] + np.arange(SEQ)
        x = mel[idx]                                   # (B, 64, 40)
        y = lab[idx].reshape(BATCH, POOL_OUT, -1, lab.shape[1]).max(2)
        yield (
            torch.from_numpy(x.transpose(0, 2, 1)[:, None].copy()),  # (B,1,40,64)
            torch.from_numpy(y.astype(np.float32)),
        )


def _full_split_er_f1(probs: np.ndarray, yw: np.ndarray):
    o = (probs > 0.5).astype(np.float32).reshape(-1, 1)
    t = yw.reshape(-1, 1)
    return ref_er_1sec(o, t, BLOCK), ref_f1_1sec(o, t, BLOCK)


def test_training_dynamics_match_torch_reference(rng):
    tr_x, tr_y = _fold(rng, 4500)
    va_x, va_y = _fold(rng, 2200)
    n_pos = int((tr_y[:, 0] > 0).sum())
    steps = (2 * n_pos) // BATCH  # the reference's epoch length law
    xw, yw = window_split(va_x, va_y, SEQ, POOL_OUT)

    # ---- this framework: scaled v1 preset, run through the real Trainer ----
    cfg = get_preset("timepooled-v1")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, conv_channels=(16, 16, 16), gru_hidden=(16, 16)
        ),
        train=cfg.train.__class__(
            **{**cfg.train.__dict__, "batch_size": BATCH, "max_epochs": EPOCHS}
        ),
    )
    fold = {"train_x": tr_x, "train_y": tr_y, "val_x": va_x, "val_y": va_y}
    ts, vs = make_samplers(cfg, fold)
    model = get_model(cfg.model)
    trainer = Trainer(model, cfg.train, ts, vs)
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(EPOCHS):
        key, k = jax.random.split(key)
        state, _ = trainer.train_epoch(state, k, steps)

    from sed_crnn_tpu.nn.layers import Ctx
    import jax.numpy as jnp

    logits, _, _ = model.apply(
        state.params, state.model_state, jnp.asarray(xw), Ctx(train=False)
    )
    jax_probs = np.asarray(jax.nn.sigmoid(logits))
    jax_er, jax_f1 = _full_split_er_f1(jax_probs, yw)

    # ---- torch reconstruction of the reference trainer (`sed.py:128-210`) --
    torch.manual_seed(0)
    tm = TorchV1Scaled()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    loss_fn = nn.BCEWithLogitsLoss()
    rngnp = np.random.default_rng(7)
    tm.train()
    for _ in range(EPOCHS):
        for xb, yb in _torch_batches(rngnp, tr_x, tr_y, steps):
            opt.zero_grad()
            loss = loss_fn(tm(xb), yb)
            loss.backward()
            opt.step()
    tm.eval()
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(xw.transpose(0, 2, 1)[:, None].copy()))
    torch_probs = torch.sigmoid(t_logits).numpy()
    torch_er, torch_f1 = _full_split_er_f1(torch_probs, yw)

    # ---- converged metrics must agree within the documented band ----------
    assert jax_er < 0.7 and torch_er < 0.7, (jax_er, torch_er)
    assert abs(jax_er - torch_er) <= 0.2, (jax_er, torch_er)
    assert abs(jax_f1 - torch_f1) <= 0.2, (jax_f1, torch_f1)

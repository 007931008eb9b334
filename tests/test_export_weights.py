"""Reverse migration: framework checkpoints -> reference-stack weights.

The strong form of each check loads the exported file with the TARGET stack
itself — torch ``load_state_dict(strict=True)`` onto reconstructions of the
reference's model classes (`sed.py:82-112`, `crnn_lightning.py:41-73`) with
forward parity, and keras's own ``load_model`` on the exported ``.keras``.
Round trips through this package's importers (whose parity vs real
torch/keras is pinned in `test_model_parity.py` / `test_keras_import.py`)
additionally require bit-exactness of the layout conversions."""

import dataclasses

import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.transplant import (
    keras_modules_from_params,
    load_keras_checkpoint,
    load_keras_h5,
    params_from_torch_state_dict,
    resolve_torch_naming,
    save_keras_checkpoint,
    save_keras_h5_weights,
    save_torch_checkpoint,
    torch_state_dict_from_params,
)
from sed_crnn_tpu.nn.layers import Ctx
from tests.test_model_parity import TorchV1

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow

TIME_POOL = (2, 2, 2)


class TorchV2Ref(nn.Module):
    """The reference v2 class VERBATIM in structure (`crnn_lightning.py:
    41-73`): a ``conv_stack`` Sequential of [Conv2d, BN, ReLU, MaxPool] per
    block plus trailing Dropout — so its state_dict keys are the real
    ``conv_stack.{4i}`` indices the v2 naming must hit."""

    def __init__(self):
        super().__init__()
        self.conv_stack = nn.Sequential()
        in_c = 1
        for pool in TIME_POOL:
            self.conv_stack.append(nn.Conv2d(in_c, 16, 3, padding=1))
            self.conv_stack.append(nn.BatchNorm2d(16))
            self.conv_stack.append(nn.ReLU())
            self.conv_stack.append(nn.MaxPool2d((1, pool)))
            in_c = 16
        self.conv_stack.append(nn.Dropout(0.4))
        self.gru1 = nn.GRU(16 * 40, 16, bidirectional=True, batch_first=True)
        self.gru2 = nn.GRU(32, 8, bidirectional=True, batch_first=True)
        self.d1 = nn.Linear(16, 8)
        self.d2 = nn.Linear(8, 1)

    def forward(self, x):
        x = self.conv_stack(x)
        x = x.permute(0, 3, 1, 2)
        b, t, c, f = x.shape
        x = x.reshape(b, t, c * f)
        x, _ = self.gru1(x)
        x, _ = self.gru2(x)
        return self.d2(torch.relu(self.d1(x)))


def _randomize_bn_state(state, rng):
    """Fresh-init BN stats are the identity (mean 0, var 1); make them
    carry signal so exports exercise the running-stat mapping."""
    for s in state["bn"]:
        c = np.shape(s["mean"])[0]
        s["mean"] = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
        s["var"] = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))


def _assert_trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_v1_loads_strict_into_reference_class(rng):
    model = get_model("timepooled-v1")
    params, state = model.init(jax.random.PRNGKey(0))
    _randomize_bn_state(state, rng)

    sd = torch_state_dict_from_params(model.cfg, params, state)
    assert "gru.weight_ih_l1_reverse" in sd  # auto resolved the stacked v1 form
    tm = TorchV1()
    tm.load_state_dict({k: torch.from_numpy(np.array(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()

    x = rng.standard_normal((4, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_export_v2_loads_strict_into_reference_class(rng):
    cfg = get_preset("timepooled-v2").model
    model = get_model(dataclasses.replace(cfg, compute_dtype="float32"))
    params, state = model.init(jax.random.PRNGKey(1))
    _randomize_bn_state(state, rng)

    sd = torch_state_dict_from_params(model.cfg, params, state)
    assert "conv_stack.4.weight" in sd  # auto resolved the Sequential v2 form
    tm = TorchV2Ref()
    tm.load_state_dict({k: torch.from_numpy(np.array(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()

    x = rng.standard_normal((3, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_export_generic_roundtrips_bit_exact(rng):
    cfg = get_preset("timepooled-v2").model
    model = get_model(dataclasses.replace(cfg, compute_dtype="float32"))
    params, state = model.init(jax.random.PRNGKey(2))
    _randomize_bn_state(state, rng)

    sd = torch_state_dict_from_params(model.cfg, params, state, naming="generic")
    assert "grus.0.weight_ih_l0" in sd and "head.1.weight" in sd
    params2, state2 = params_from_torch_state_dict(model.cfg, sd)
    _assert_trees_equal(params, params2)
    _assert_trees_equal(state, state2)


def test_export_naming_validation():
    cfg = get_preset("timepooled-v2").model
    model = get_model(dataclasses.replace(cfg, compute_dtype="float32"))
    params, state = model.init(jax.random.PRNGKey(3))
    assert resolve_torch_naming(params) == "v2"
    with pytest.raises(ValueError, match="naming='v1'"):
        # v2's (16, 8) GRU hiddens cannot stack into one torch nn.GRU
        torch_state_dict_from_params(model.cfg, params, state, naming="v1")
    with pytest.raises(ValueError, match="unknown naming"):
        resolve_torch_naming(params, "v3")


def test_export_torch_refuses_sednet():
    cfg = get_preset("sednet-dcase").model
    model = get_model(cfg)
    params, state = model.init(jax.random.PRNGKey(4))
    with pytest.raises(ValueError, match="save_keras_checkpoint"):
        torch_state_dict_from_params(cfg, params, state)


def test_keras_export_refuses_torch_cell():
    cfg = get_preset("timepooled-v1").model
    model = get_model(cfg)
    params, state = model.init(jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="save_torch_checkpoint"):
        keras_modules_from_params(params, state)
    with pytest.raises(ValueError, match="sednet presets"):
        save_keras_checkpoint("x.h5", cfg, params, state)


def _small_sednet_cfg():
    cfg = get_preset("sednet-dcase-keras").model
    return dataclasses.replace(
        cfg, seq_len_in=64, conv_channels=(8, 8, 8), gru_hidden=(4, 4)
    )


def _damped_sednet_params(key, cfg, rng):
    """Init + halve the recurrent gain (contractive recurrence — same
    rationale as `test_keras_import.py`: fresh orthogonal recurrences
    amplify f32 rounding chaotically, trained ones are stable)."""
    model = get_model(cfg)
    params, state = model.init(key)
    for g in params["gru"]:
        for d in ("fwd", "bwd"):
            g[d]["wh"] = g[d]["wh"] * 0.5
    _randomize_bn_state(state, rng)
    return model, params, state


def test_keras_export_real_keras_forward_parity(tmp_path, rng):
    """Export .keras, load with keras ITSELF, require inference parity —
    the target stack, not our importer, is the oracle here."""
    import keras

    cfg = _small_sednet_cfg()
    model, params, state = _damped_sednet_params(jax.random.PRNGKey(6), cfg, rng)

    path = str(tmp_path / "sednet_export.keras")
    save_keras_checkpoint(path, cfg, params, state)
    kmodel = keras.saving.load_model(path, compile=False)

    x = rng.standard_normal((2, cfg.seq_len_in, cfg.n_mels)).astype(np.float32)
    k_out = np.asarray(kmodel(x[..., None], training=False))
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    assert k_out.shape == logits.shape == (2, cfg.seq_len_in, cfg.n_classes)
    np.testing.assert_allclose(np.asarray(logits), k_out, atol=1e-4, rtol=1e-3)


def test_keras_export_roundtrips_through_importers(tmp_path, rng):
    """Both keras formats re-import to bit-identical pytrees (the z/r gate
    swap is an involution; no arithmetic touches the weights)."""
    cfg = _small_sednet_cfg()
    _model, params, state = _damped_sednet_params(jax.random.PRNGKey(7), cfg, rng)

    h5 = str(tmp_path / "sednet_legacy.h5")
    save_keras_h5_weights(h5, params, state)
    params2, state2 = load_keras_h5(h5, cfg)
    _assert_trees_equal(params, params2)
    _assert_trees_equal(state, state2)

    kf = str(tmp_path / "sednet_modern.keras")
    save_keras_checkpoint(kf, cfg, params, state)
    params3, state3 = load_keras_checkpoint(kf, cfg)
    _assert_trees_equal(params, params3)
    _assert_trees_equal(state, state3)


def test_export_weights_cli(tmp_path, rng):
    """The CLI end to end: framework npz -> torch .pt that the reference's
    own class strict-loads."""
    from sed_crnn_tpu.apps.export_weights import main as export_main

    model = get_model("timepooled-v1")
    params, state = model.init(jax.random.PRNGKey(8))
    _randomize_bn_state(state, rng)
    npz = str(tmp_path / "best_fold1.npz")
    ckpt_io.save_checkpoint(npz, {"params": params, "model_state": state},
                            {"preset": "timepooled-v1"})

    out = str(tmp_path / "best_fold1.pt")
    export_main(["--checkpoint", npz, "--preset", "timepooled-v1", "--out", out])
    sd = torch.load(out, map_location="cpu", weights_only=True)
    tm = TorchV1()
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    x = rng.standard_normal((2, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1)[:, None])).numpy()
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)

    with pytest.raises(ValueError, match="unrecognized output extension"):
        export_main(["--checkpoint", npz, "--preset", "timepooled-v1",
                     "--out", str(tmp_path / "weights.onnx")])

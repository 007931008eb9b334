"""Keras cross-validation: the real `keras.layers.GRU` as an oracle for the
keras-convention cell in `nn/gru.py`, and `.h5`/`.keras` SEDnet checkpoint
import (`models/transplant.py::load_keras_checkpoint`) with forward parity
against keras inference.

The reference SEDnet lineage is keras 2.2.4 (`/root/reference/
requirements.txt:1`, `README.md:44`); the installed keras is 3.x. Two
compatibility notes these tests encode:

* keras-3's builtin ``hard_sigmoid`` is ``relu6(x+3)/6`` (slope 1/6) — NOT
  keras-2.2's ``clip(0.2x+0.5, 0, 1)``; the legacy recurrent activation is
  therefore passed as a registered custom function.
* keras GRU packs gate columns (z, r, h); this framework uses torch order
  (r, z, n) — the import reorders columns (`_reorder_keras_gates`).
"""

import os

# TF's oneDNN dispatch runs big convs in bfloat16 on this host (measured
# 2.4e-3 divergence on conv block 1 alone); force exact f32 keras inference
# BEFORE tensorflow initializes so the 1e-5 parity band is meaningful.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import numpy as np
import pytest

import jax
import jax.numpy as jnp

keras = pytest.importorskip("keras")

from sed_crnn_tpu.core.config import get_preset  # noqa: E402
from sed_crnn_tpu.models import get_model  # noqa: E402
from sed_crnn_tpu.models.transplant import (  # noqa: E402
    load_keras_checkpoint,
    load_keras_h5,
)
from sed_crnn_tpu.nn.gru import GRU  # noqa: E402
from sed_crnn_tpu.nn.layers import Ctx  # noqa: E402

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


@keras.saving.register_keras_serializable(package="sed_crnn_tpu_tests")
def hard_sigmoid_legacy(x):
    """keras-2.2.4's hard_sigmoid: clip(0.2x + 0.5, 0, 1)."""
    return keras.ops.clip(0.2 * x + 0.5, 0.0, 1.0)


def test_keras3_hard_sigmoid_differs_from_legacy():
    """Guard the compatibility note above: if keras ever reverts its
    hard_sigmoid to the 2.2-era slope, the custom function becomes
    unnecessary and this test flags it."""
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    modern = np.asarray(keras.activations.hard_sigmoid(x))
    legacy = np.clip(0.2 * x + 0.5, 0.0, 1.0)
    assert not np.allclose(modern, legacy, atol=1e-3)


def _our_to_keras_gates(w, H):
    """(r, z, n) columns -> keras (z, r, h)."""
    return np.concatenate([w[..., H : 2 * H], w[..., :H], w[..., 2 * H :]], axis=-1)


@pytest.mark.parametrize("gate_activation", ["sigmoid", "hard_sigmoid"])
def test_gru_cell_matches_real_keras_gru(rng, gate_activation):
    """`nn/gru.py` with ``reset_after=False`` vs an actual keras GRU layer
    carrying the SAME weights: the hand-written cell must reproduce keras's
    recurrence (gate wiring, reset-before-matmul, single bias) to ~1e-5."""
    B, T, D, H = 3, 11, 7, 5
    cell = GRU(D, H, reset_after=False, gate_activation=gate_activation)
    params = cell.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    ours, h_last = cell.apply(params, jnp.asarray(x))

    rec_act = "sigmoid" if gate_activation == "sigmoid" else hard_sigmoid_legacy
    layer = keras.layers.GRU(
        H,
        activation="tanh",
        recurrent_activation=rec_act,
        reset_after=False,
        return_sequences=True,
        return_state=True,
    )
    layer.build((None, T, D))
    kernel = _our_to_keras_gates(np.asarray(params["wi"]), H)
    recurrent = _our_to_keras_gates(np.asarray(params["wh"]), H)
    bias = _our_to_keras_gates(np.asarray(params["bi"]), H)
    assert [w.shape for w in layer.get_weights()] == [
        kernel.shape, recurrent.shape, bias.shape,
    ]
    layer.set_weights([kernel, recurrent, bias])
    k_out, k_state = layer(x)

    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(k_out), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_last), np.asarray(k_state), atol=1e-5, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# SEDnet checkpoint import
# ---------------------------------------------------------------------------


def _build_keras_sednet(cfg, rng):
    """The DCASE 2017 SEDnet as a keras-3 functional model matching the
    ``sednet-dcase`` preset's structure (reference `README.md:29-44` +
    diagram): channels_last conv blocks with mel-axis pooling, permute to
    the [T, C, F] flatten order `models/crnn.py` uses, two bidirectional
    GRUs with the legacy recurrent activation, linear TD dense head."""
    m = cfg.model
    T, F = m.seq_len_in, m.n_mels
    inp = keras.Input((T, F, m.in_channels))
    x = inp
    for out_ch, p in zip(m.conv_channels, m.pool):
        x = keras.layers.Conv2D(out_ch, m.kernel_size, padding="same")(x)
        x = keras.layers.BatchNormalization(axis=-1, epsilon=m.bn_eps)(x)
        x = keras.layers.Activation("relu")(x)
        x = keras.layers.MaxPooling2D((1, p))(x)
        F //= p
    x = keras.layers.Permute((1, 3, 2))(x)             # (T, F', C) -> (T, C, F')
    x = keras.layers.Reshape((T, m.conv_channels[-1] * F))(x)
    for h in m.gru_hidden:
        x = keras.layers.Bidirectional(
            keras.layers.GRU(
                h,
                activation="tanh",
                recurrent_activation=hard_sigmoid_legacy,
                reset_after=False,
                return_sequences=True,
            ),
            merge_mode="concat",
        )(x)
    for d in m.head_dims:
        x = keras.layers.TimeDistributed(keras.layers.Dense(d))(x)
    model = keras.Model(inp, x)

    # Default init already randomizes conv/GRU/dense weights; BN moving
    # stats and affine default to identity — randomize them so the import
    # parity actually exercises the BN mapping.
    for layer in model.layers:
        if type(layer).__name__ == "BatchNormalization":
            c = layer.get_weights()[0].shape[0]
            layer.set_weights([
                rng.uniform(0.5, 1.5, c).astype(np.float32),   # gamma
                rng.standard_normal(c).astype(np.float32) * 0.1,  # beta
                rng.standard_normal(c).astype(np.float32) * 0.1,  # moving_mean
                rng.uniform(0.5, 1.5, c).astype(np.float32),   # moving_var
            ])
        elif type(layer).__name__ == "Bidirectional":
            # Freshly-initialized (orthogonal) recurrent kernels are not
            # contractive: over 256 recurrence steps, any two CORRECT f32
            # implementations drift apart chaotically (measured ~6e-3 here
            # while the conv trunk matched to 5e-7 and an 11-step GRU to
            # 1e-7). Halving the recurrent gain makes the recurrence
            # contractive so the 1e-5 band measures implementation parity,
            # not f32 chaos. Trained SEDnets are stable in practice.
            for sub in (layer.forward_layer, layer.backward_layer):
                k, r, b = sub.get_weights()
                sub.set_weights([k, 0.5 * r, b])
    return model


def _legacy_h5_from_keras(model, path):
    """Write the model's weights in the keras-2.2 HDF5 layout (root
    ``layer_names`` attr; per-layer ``weight_names`` attrs) — the format the
    2017-era ``ModelCheckpoint`` produced and `load_keras_h5` parses."""
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        layer_names = []
        for i, layer in enumerate(model.layers):
            kind = type(layer).__name__
            lname = f"{kind.lower()}_{i}"
            layer_names.append(lname.encode())
            lg = g.create_group(lname)
            wnames = []
            if kind == "Bidirectional":
                for tag, sub in (
                    ("forward_gru", layer.forward_layer),
                    ("backward_gru", layer.backward_layer),
                ):
                    for wn, w in zip(
                        ("kernel", "recurrent_kernel", "bias"), sub.get_weights()
                    ):
                        name = f"{lname}/{tag}/{wn}:0"
                        lg.create_dataset(name, data=w)
                        wnames.append(name.encode())
            elif kind == "TimeDistributed":
                for wn, w in zip(("kernel", "bias"), layer.layer.get_weights()):
                    name = f"{lname}/dense/{wn}:0"
                    lg.create_dataset(name, data=w)
                    wnames.append(name.encode())
            elif kind == "Conv2D":
                for wn, w in zip(("kernel", "bias"), layer.get_weights()):
                    name = f"{lname}/{wn}:0"
                    lg.create_dataset(name, data=w)
                    wnames.append(name.encode())
            elif kind == "BatchNormalization":
                for wn, w in zip(
                    ("gamma", "beta", "moving_mean", "moving_variance"),
                    layer.get_weights(),
                ):
                    name = f"{lname}/{wn}:0"
                    lg.create_dataset(name, data=w)
                    wnames.append(name.encode())
            lg.attrs["weight_names"] = np.array(wnames, dtype="S")
        g.attrs["layer_names"] = np.array(layer_names, dtype="S")


def _our_trunk(cfg, params, state, x):
    """The conv trunk exactly as `models/crnn.py` runs it for mel-pooled
    presets, up to the [T, C*F] flatten the GRUs consume."""
    from sed_crnn_tpu.nn.layers import BatchNorm2d, Conv2d, max_pool2d

    m = cfg.model
    h = jnp.asarray(x)[:, :, :, None]          # (B, T, F, C) NHWC
    in_ch = m.in_channels
    for i, (out_ch, p) in enumerate(zip(m.conv_channels, m.pool)):
        h = Conv2d(in_ch, out_ch, m.kernel_size).apply(params["conv"][i], h)
        h, _ = BatchNorm2d(out_ch, m.bn_eps, m.bn_momentum).apply(
            params["bn"][i], state["bn"][i], h, Ctx(train=False)
        )
        h = jax.nn.relu(h)
        h = max_pool2d(h, (1, p))
        in_ch = out_ch
    h = jnp.transpose(h, (0, 1, 3, 2))          # (B, T, C, F')
    return h.reshape(h.shape[0], h.shape[1], -1)


def test_keras_sednet_import_forward_parity(tmp_path, rng):
    """Full-size SEDnet (conv 128, biGRU 32x2, 256 frames): save the keras
    model, import onto the sednet-dcase preset, and require forward parity
    against keras's own inference — the done-criterion for keras migration
    (VERDICT round 2, next-round item 2).

    The 1e-5 band applies piecewise because the full composition is
    ill-conditioned, not because the import is: the GRU update gate
    integrates input perturbations over 256 steps, so the trunk's
    unavoidable ~5e-7 f32 reassociation difference (jax vs TF conv) grows
    ~1e4x through the two recurrent layers (measured: trunk 5e-7, GRU+head
    on IDENTICAL input 3e-7, end to end 8e-3). Any two correct f32
    implementations diverge end to end like this; each imported stage is
    held to <= 1e-5 on its own input, and the end-to-end product to the
    measured conditioning band."""
    import dataclasses

    from sed_crnn_tpu.nn.gru import BiGRU

    cfg = get_preset("sednet-dcase")
    # keras-2.2.4 trained with hard_sigmoid recurrent gates; serve the
    # imported checkpoint with the matching cell numerics (the import warns
    # otherwise — asserted in test_keras_import_warns_on_sigmoid_config).
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, gru_gate_activation="hard_sigmoid")
    )
    kmodel = _build_keras_sednet(cfg, rng)

    path = str(tmp_path / "sednet.keras")
    kmodel.save(path)
    params, state = load_keras_checkpoint(path, cfg.model)

    model = get_model(cfg.model)
    x = rng.standard_normal((2, cfg.model.seq_len_in, cfg.model.n_mels))
    x = x.astype(np.float32)

    # -- stage 1: conv trunk (conv + BN + relu + mel-pool + flatten) --------
    names = [type(l).__name__ for l in kmodel.layers]
    k_trunk = np.asarray(
        keras.Model(kmodel.input, kmodel.layers[names.index("Reshape")].output)(
            x[..., None], training=False
        )
    )
    ours_trunk = np.asarray(_our_trunk(cfg, params, state, x))
    np.testing.assert_allclose(ours_trunk, k_trunk, atol=1e-5, rtol=1e-4)

    # -- stage 2: GRU stack + TD head on IDENTICAL (keras) trunk input ------
    k_out = np.asarray(kmodel(x[..., None], training=False))
    h = jnp.asarray(k_trunk)
    for i, hid in enumerate(cfg.model.gru_hidden):
        g = BiGRU(h.shape[-1], hid, reset_after=False,
                  gate_activation=cfg.model.gru_gate_activation)
        h, _ = g.apply(params["gru"][i], h)
    for i in range(len(cfg.model.head_dims)):
        h = h @ params["head"][i]["w"] + params["head"][i]["b"]
    np.testing.assert_allclose(np.asarray(h), k_out, atol=1e-5, rtol=1e-4)

    # -- end to end: the full imported model, conditioning-scaled band ------
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    ours = np.asarray(logits)
    assert ours.shape == k_out.shape == (2, 256, cfg.model.n_classes)
    np.testing.assert_allclose(ours, k_out, atol=2e-2, rtol=0.5)


def test_keras_legacy_h5_import_matches_keras3_import(tmp_path, rng):
    """The keras-2.2 HDF5 layout (what reference-lineage users actually
    hold) must import to the SAME params as the modern keras file."""
    cfg = get_preset("sednet-dcase")
    kmodel = _build_keras_sednet(cfg, rng)

    modern = str(tmp_path / "sednet.keras")
    legacy = str(tmp_path / "sednet_legacy.h5")
    kmodel.save(modern)
    _legacy_h5_from_keras(kmodel, legacy)

    p_modern, s_modern = load_keras_checkpoint(modern, cfg.model)
    p_legacy, s_legacy = load_keras_h5(legacy, cfg.model)
    # load_keras_checkpoint on a legacy .h5 must route to the h5 parser too
    p_legacy2, _ = load_keras_checkpoint(legacy, cfg.model)

    for a, b in zip(
        jax.tree_util.tree_leaves((p_modern, s_modern)),
        jax.tree_util.tree_leaves((p_legacy, s_legacy)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(p_modern), jax.tree_util.tree_leaves(p_legacy2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keras_import_warns_on_sigmoid_config(tmp_path, rng):
    """The default sednet preset uses sigmoid gates (the published
    architecture is silent on gate activations); importing keras-2.2.4
    weights onto it must warn that the trained cell used hard_sigmoid."""
    cfg = get_preset("sednet-dcase")
    kmodel = _build_keras_sednet(cfg, rng)
    path = str(tmp_path / "sednet.keras")
    kmodel.save(path)
    with pytest.warns(UserWarning, match="hard_sigmoid"):
        load_keras_checkpoint(path, cfg.model)


def test_keras_import_rejects_mismatched_preset(tmp_path, rng):
    from sed_crnn_tpu.core.config import ModelConfig
    from sed_crnn_tpu.models.transplant import params_from_keras_modules

    with pytest.raises(ValueError, match="sednet"):
        params_from_keras_modules(ModelConfig(name="timepooled_v1"), [])

    cfg = get_preset("sednet-dcase")
    kmodel = _build_keras_sednet(cfg, rng)
    path = str(tmp_path / "sednet.keras")
    kmodel.save(path)
    binaural = get_preset("sednet-dcase-binaural")
    with pytest.raises(ValueError, match="conv block 0"):
        load_keras_checkpoint(path, binaural.model)


def test_keras_preset_and_import_cli_roundtrip(tmp_path, rng):
    """The sednet-dcase-keras preset carries hard_sigmoid gates (no warning
    on import), and the import CLI writes a framework checkpoint that loads
    and runs."""
    import warnings

    from sed_crnn_tpu.apps.import_torch import import_checkpoint
    from sed_crnn_tpu.core import checkpoint as ckpt_io

    cfg = get_preset("sednet-dcase-keras")
    assert cfg.model.gru_gate_activation == "hard_sigmoid"
    kmodel = _build_keras_sednet(cfg, rng)
    src = str(tmp_path / "sednet.keras")
    kmodel.save(src)

    out = str(tmp_path / "imported.npz")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # hard_sigmoid preset: no gate warning
        import_checkpoint(src, "sednet-dcase-keras", out, source="keras")

    tree, meta = ckpt_io.load_checkpoint(out)
    assert meta["preset"] == "sednet-dcase-keras"
    model = get_model(cfg.model)
    x = rng.standard_normal((1, 256, 40)).astype(np.float32)
    logits, _, _ = model.apply(
        tree["params"], tree["model_state"], jnp.asarray(x), Ctx(train=False)
    )
    assert logits.shape == (1, 256, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_keras_imported_sednet_streams(tmp_path, rng):
    """Tie-in: a keras-imported SEDnet (scaled widths for CPU speed) served
    through lookahead streaming stays close to keras's own full-sequence
    inference — migration and the streaming runtime compose."""
    import dataclasses

    from sed_crnn_tpu.models.streaming import stream_probabilities

    cfg = get_preset("sednet-dcase-keras")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, seq_len_in=64, conv_channels=(8, 8, 8), gru_hidden=(4, 4),
            head_dims=(5, 6),
        )
    )
    kmodel = _build_keras_sednet(cfg, rng)
    path = str(tmp_path / "sednet_small.keras")
    kmodel.save(path)
    params, state = load_keras_checkpoint(path, cfg.model)
    model = get_model(cfg.model)

    n_chunks = 4
    mel = rng.standard_normal((64 * n_chunks, 40)).astype(np.float32)
    look = stream_probabilities(model, params, state, mel, lookahead=True)

    # keras full-sequence oracle needs a matching-length model: rebuild the
    # functional graph at the full length with the SAME layer weights.
    full_cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, seq_len_in=64 * n_chunks)
    )
    kfull = _build_keras_sednet(full_cfg, rng)
    kfull.set_weights(kmodel.get_weights())
    k_probs = 1.0 / (1.0 + np.exp(-np.asarray(kfull(mel[None, ..., None],
                                                    training=False))[0]))
    assert look.shape == k_probs.shape
    # bounded divergence: conv zero-padding at chunk edges + truncated
    # right context; planted-scale inputs keep this small
    assert np.abs(look - k_probs).mean() < 0.05
    assert np.abs(look - k_probs).max() < 0.4

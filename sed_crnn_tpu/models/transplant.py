"""Checkpoint import: migrate reference-lineage weights into CRNN pytrees.

Two migration paths cover the reference's two generations:

* **Torch/Lightning** (`sed.py:82-112`, `crnn_lightning.py:41-73`):
  ``load_torch_checkpoint`` maps a torch ``state_dict`` onto the
  timepooled-v1/v2 presets (torch GRUs carry cuDNN ``reset_after`` gate
  semantics, so they cannot land on the keras-convention sednet cell).
* **Keras** (the original SEDnet lineage, keras 2.2.4 per the reference
  `requirements.txt:1` and `README.md:44`): ``load_keras_checkpoint`` reads
  either a legacy keras-2 HDF5 weight file (the format the 2017-era
  ``ModelCheckpoint`` wrote) or a model file the installed keras can load
  (``.keras``/full-model ``.h5``), and maps it onto the sednet presets —
  gate columns reordered z,r,h -> r,z,n, conv kernels already HWIO.

Torch layout conventions converted:

* Conv2d ``(out, in, kh, kw)`` -> HWIO ``(kh, kw, in, out)``;
* Linear/GRU weights transpose to right-multiply form (``x @ w``);
* torch's stacked bidirectional ``nn.GRU(num_layers=k)`` splits into k
  successive BiGRU parameter dicts (gate order r,z,n and reset_after=True
  match torch/cuDNN — see `nn/gru.py`);
* BatchNorm running stats land in model STATE, affine in params.

Modules are discovered structurally (4-D conv kernels, ``running_mean`` for
BN, ``weight_ih_l0`` for GRUs, trailing 2-D weights for the head) in
state-dict insertion order — torch preserves registration order, so this
matches the sequential architectures used here without hard-coding names.
Numerical parity of the mapping is pinned by `tests/test_model_parity.py`
(transplanted forward within 2e-4 of torch eval mode).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

import jax.numpy as jnp

from sed_crnn_tpu.core.config import ModelConfig


def _np(v) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch."""
    if hasattr(v, "detach"):
        v = v.detach()
    if hasattr(v, "cpu"):
        v = v.cpu()
    if hasattr(v, "numpy"):
        v = v.numpy()
    return np.asarray(v)


def strip_prefixes(sd: Mapping[str, Any], prefixes=("model.", "module.")) -> Dict[str, Any]:
    """Remove a common leading prefix (Lightning's ``model.``, DDP's
    ``module.``) when EVERY key carries it."""
    out = dict(sd)
    for p in prefixes:
        if out and all(k.startswith(p) for k in out):
            out = {k[len(p):]: v for k, v in out.items()}
    return out


def _group_modules(sd: Mapping[str, Any]) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """Group flat state-dict keys by module prefix, insertion-ordered."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        prefix, _, leaf = k.rpartition(".")
        groups.setdefault(prefix, {})[leaf] = _np(v)
    return list(groups.items())


def _gru_layer_params(mod: Dict[str, np.ndarray], layer: int, reverse: bool):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "wi": jnp.asarray(mod[f"weight_ih{sfx}"].T),
        "wh": jnp.asarray(mod[f"weight_hh{sfx}"].T),
        "bi": jnp.asarray(mod[f"bias_ih{sfx}"]),
        "bh": jnp.asarray(mod[f"bias_hh{sfx}"]),
    }


def params_from_torch_state_dict(
    cfg: ModelConfig, state_dict: Mapping[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Torch ``state_dict`` -> ``(params, state)`` for `models/crnn.py::CRNN`.

    Raises ValueError with the offending shapes when the checkpoint does not
    structurally match ``cfg`` (conv channels, GRU widths, head dims).
    """
    if cfg.name == "sednet":
        raise ValueError(
            "sednet presets use the keras-2.2.4 GRU cell (reset_after=False, "
            "hard_sigmoid gates, single bias) — torch GRU weights encode "
            "cuDNN reset_after semantics and cannot be transplanted onto it; "
            "only the timepooled-v1/v2 presets accept torch checkpoints. "
            "SEDnet checkpoints from the keras lineage import via "
            "load_keras_checkpoint"
        )
    sd = strip_prefixes(state_dict)
    convs: List[Dict[str, np.ndarray]] = []
    bns: List[Dict[str, np.ndarray]] = []
    gru_layers: List[Dict[str, Any]] = []
    linears: List[Dict[str, np.ndarray]] = []

    for name, mod in _group_modules(sd):
        if "running_mean" in mod:
            bns.append(mod)
        elif any(k.startswith("weight_ih_l") for k in mod):
            n_layers = 1 + max(
                int(k.split("_l")[-1].split("_")[0])
                for k in mod
                if k.startswith("weight_ih_l")
            )
            if not any(k.endswith("_reverse") for k in mod):
                raise ValueError(
                    f"GRU module {name!r} is unidirectional; the CRNN family "
                    "uses bidirectional recurrences"
                )
            for layer in range(n_layers):
                gru_layers.append(
                    {
                        "fwd": _gru_layer_params(mod, layer, False),
                        "bwd": _gru_layer_params(mod, layer, True),
                    }
                )
        elif "weight" in mod and mod["weight"].ndim == 4:
            convs.append(mod)
        elif "weight" in mod and mod["weight"].ndim == 2:
            linears.append(mod)
        # anything else (dropout etc.) holds no parameters

    n_blocks = len(cfg.conv_channels)
    if len(convs) != n_blocks or len(bns) != n_blocks:
        raise ValueError(
            f"expected {n_blocks} conv+BN blocks for preset {cfg.name!r}, "
            f"found {len(convs)} convs / {len(bns)} BNs in the checkpoint"
        )
    if len(gru_layers) != len(cfg.gru_hidden):
        raise ValueError(
            f"expected {len(cfg.gru_hidden)} bidirectional GRU layers, "
            f"found {len(gru_layers)}"
        )
    if len(linears) != len(cfg.head_dims):
        raise ValueError(
            f"expected {len(cfg.head_dims)} head dense layers, found {len(linears)}"
        )

    params: Dict[str, Any] = {"conv": [], "bn": [], "gru": gru_layers, "head": []}
    state: Dict[str, Any] = {"bn": []}
    expect_in = cfg.in_channels
    for i, (conv, bn) in enumerate(zip(convs, bns)):
        w = conv["weight"]
        out_ch = cfg.conv_channels[i]
        if w.shape[0] != out_ch or w.shape[1] != expect_in:
            raise ValueError(
                f"conv block {i}: checkpoint kernel {w.shape} vs config "
                f"(out={out_ch}, in={expect_in})"
            )
        params["conv"].append(
            {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(conv["bias"])}
        )
        params["bn"].append(
            {"scale": jnp.asarray(bn["weight"]), "bias": jnp.asarray(bn["bias"])}
        )
        state["bn"].append(
            {
                "mean": jnp.asarray(bn["running_mean"], jnp.float32),
                "var": jnp.asarray(bn["running_var"], jnp.float32),
            }
        )
        expect_in = out_ch

    for i, (g, h) in enumerate(zip(gru_layers, cfg.gru_hidden)):
        if g["fwd"]["wh"].shape[0] != h:
            raise ValueError(
                f"GRU layer {i}: checkpoint hidden {g['fwd']['wh'].shape[0]} "
                f"vs config {h}"
            )

    for i, (lin, d) in enumerate(zip(linears, cfg.head_dims)):
        if lin["weight"].shape[0] != d:
            raise ValueError(
                f"head layer {i}: checkpoint out-dim {lin['weight'].shape[0]} "
                f"vs config {d}"
            )
        params["head"].append(
            {"w": jnp.asarray(lin["weight"].T), "b": jnp.asarray(lin["bias"])}
        )

    return params, state


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """Read a torch/Lightning ``.pt``/``.ckpt`` file and return
    ``(params, state)``. Accepts a raw state_dict or a dict wrapping one
    under ``state_dict``/``model``."""
    import pickle
    import warnings

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # Lightning checkpoints pickle hyper_parameters as an AttributeDict,
        # which the weights-only unpickler rejects. Only THAT rejection falls
        # back to a full unpickle (arbitrary code execution for a malicious
        # file — hence the warning); corrupt files and IO errors propagate.
        warnings.warn(
            f"{path}: weights-only load rejected the pickle; falling back to "
            "a FULL unpickle, which executes code embedded in the checkpoint "
            "— only do this with checkpoints you trust",
            stacklevel=2,
        )
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    elif isinstance(obj, dict) and isinstance(obj.get("model"), dict) and all(
        hasattr(v, "shape") for v in obj["model"].values()
    ):
        obj = obj["model"]
    return params_from_torch_state_dict(cfg, obj)


# ---------------------------------------------------------------------------
# Keras import (the SEDnet lineage: keras 2.2.4 HDF5 checkpoints)
# ---------------------------------------------------------------------------

# A parsed keras module stream: ("conv", [kernel, bias]),
# ("bn", [gamma, beta, moving_mean, moving_var]),
# ("bigru", {"fwd": [kernel, recurrent, bias], "bwd": [...]}),
# ("dense", [kernel, bias]) — in model order. Parameterless layers
# (activation, pooling, reshape, dropout) are never emitted.
KerasModule = Tuple[str, Any]


def _reorder_keras_gates(w: np.ndarray, hidden: int) -> np.ndarray:
    """Keras packs GRU gate columns as (z, r, h) (update, reset, candidate);
    this framework's `nn/gru.py` uses torch's (r, z, n) order. Pure column
    permutation — the cell math is otherwise identical for
    ``reset_after=False`` (keras-2.2 convention)."""
    z, r, h = (
        w[..., :hidden],
        w[..., hidden : 2 * hidden],
        w[..., 2 * hidden :],
    )
    return np.concatenate([r, z, h], axis=-1)


def _keras_gru_dir_params(arrays, hidden: int) -> Dict[str, Any]:
    kernel, recurrent, bias = (np.asarray(a) for a in arrays)
    if recurrent.shape[0] != hidden:
        raise ValueError(
            f"GRU recurrent kernel hidden {recurrent.shape[0]} != config {hidden}"
        )
    if bias.ndim != 1:
        raise ValueError(
            "keras GRU bias has shape "
            f"{bias.shape}: reset_after=True checkpoints carry a (2, 3H) "
            "bias and belong to the modern keras cell — the sednet presets "
            "use the keras-2.2 reset_after=False convention"
        )
    return {
        "wi": jnp.asarray(_reorder_keras_gates(kernel, hidden)),
        "wh": jnp.asarray(_reorder_keras_gates(recurrent, hidden)),
        "bi": jnp.asarray(_reorder_keras_gates(bias, hidden)),
    }


def params_from_keras_modules(
    cfg: ModelConfig, modules: List[KerasModule]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Ordered keras module stream -> ``(params, state)`` for
    `models/crnn.py::CRNN`. Keras conv kernels are already HWIO and dense
    kernels already right-multiply, so only the GRU gate order converts."""
    if cfg.name != "sednet":
        raise ValueError(
            "keras import targets the sednet presets (keras-convention GRU, "
            "reset_after=False); torch-trained timepooled checkpoints go "
            "through load_torch_checkpoint"
        )
    if cfg.gru_gate_activation != "hard_sigmoid":
        import warnings

        warnings.warn(
            "importing a keras SEDnet checkpoint onto a config with "
            f"gru_gate_activation={cfg.gru_gate_activation!r}: keras-2.2.4 "
            "trained its GRU gates with hard_sigmoid — serve with "
            "gru_gate_activation='hard_sigmoid' to reproduce the trained "
            "model's numerics",
            stacklevel=2,
        )
    convs = [m for k, m in modules if k == "conv"]
    bns = [m for k, m in modules if k == "bn"]
    bigrus = [m for k, m in modules if k == "bigru"]
    denses = [m for k, m in modules if k == "dense"]

    n_blocks = len(cfg.conv_channels)
    if len(convs) != n_blocks or len(bns) != n_blocks:
        raise ValueError(
            f"expected {n_blocks} conv+BN blocks for preset {cfg.name!r}, "
            f"found {len(convs)} convs / {len(bns)} BNs"
        )
    if len(bigrus) != len(cfg.gru_hidden):
        raise ValueError(
            f"expected {len(cfg.gru_hidden)} bidirectional GRU layers, "
            f"found {len(bigrus)}"
        )
    if len(denses) != len(cfg.head_dims):
        raise ValueError(
            f"expected {len(cfg.head_dims)} head dense layers, found {len(denses)}"
        )

    params: Dict[str, Any] = {"conv": [], "bn": [], "gru": [], "head": []}
    state: Dict[str, Any] = {"bn": []}
    expect_in = cfg.in_channels
    for i, (conv, bn) in enumerate(zip(convs, bns)):
        w = np.asarray(conv[0])
        out_ch = cfg.conv_channels[i]
        if w.shape[3] != out_ch or w.shape[2] != expect_in:
            raise ValueError(
                f"conv block {i}: checkpoint kernel {w.shape} (HWIO) vs "
                f"config (in={expect_in}, out={out_ch})"
            )
        params["conv"].append(
            {"w": jnp.asarray(w), "b": jnp.asarray(np.asarray(conv[1]))}
        )
        gamma, beta, mean, var = (np.asarray(a) for a in bn)
        params["bn"].append(
            {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}
        )
        state["bn"].append(
            {
                "mean": jnp.asarray(mean, jnp.float32),
                "var": jnp.asarray(var, jnp.float32),
            }
        )
        expect_in = out_ch

    for g, h in zip(bigrus, cfg.gru_hidden):
        params["gru"].append(
            {
                "fwd": _keras_gru_dir_params(g["fwd"], h),
                "bwd": _keras_gru_dir_params(g["bwd"], h),
            }
        )

    for i, (dense, d) in enumerate(zip(denses, cfg.head_dims)):
        k = np.asarray(dense[0])
        if k.shape[1] != d:
            raise ValueError(
                f"head layer {i}: checkpoint out-dim {k.shape[1]} vs config {d}"
            )
        params["head"].append(
            {"w": jnp.asarray(k), "b": jnp.asarray(np.asarray(dense[1]))}
        )
    return params, state


def _classify_weight_group(wnames: List[str], arrays: List[np.ndarray]):
    """One legacy-h5 layer (its weight names + arrays) -> KerasModule(s)."""
    if any("backward" in n for n in wnames):  # Bidirectional RNN
        fwd = [a for n, a in zip(wnames, arrays) if "backward" not in n]
        bwd = [a for n, a in zip(wnames, arrays) if "backward" in n]
        if len(fwd) != 3 or len(bwd) != 3:
            raise ValueError(
                f"bidirectional layer has {len(fwd)} forward / {len(bwd)} "
                "backward weights; expected kernel+recurrent+bias each"
            )
        return [("bigru", {"fwd": fwd, "bwd": bwd})]
    if len(arrays) == 4 and all(a.ndim == 1 for a in arrays):
        return [("bn", arrays)]  # gamma, beta, moving_mean, moving_variance
    if arrays and arrays[0].ndim == 4:
        return [("conv", arrays)]
    if arrays and arrays[0].ndim == 2:
        return [("dense", arrays)]
    raise ValueError(
        f"unrecognized keras layer weights {[a.shape for a in arrays]} "
        f"({wnames})"
    )


def load_keras_h5(path: str, cfg: ModelConfig):
    """Legacy keras-2 HDF5 (``model.save`` / ``save_weights`` /
    ``ModelCheckpoint`` of the 2017-era SEDnet, keras 2.2.4): layer order
    from the ``layer_names`` attr, weights from each layer's
    ``weight_names`` attr. Returns ``(params, state)``."""
    import h5py

    def _s(v):
        return v.decode() if isinstance(v, bytes) else str(v)

    modules: List[KerasModule] = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        if "layer_names" not in g.attrs:
            raise ValueError(
                f"{path}: no keras-2 'layer_names' attribute — for keras-3 "
                "files use load_keras_checkpoint, which loads via the "
                "installed keras"
            )
        for lname in [_s(n) for n in g.attrs["layer_names"]]:
            lg = g[lname]
            wnames = [_s(n) for n in lg.attrs.get("weight_names", [])]
            if not wnames:
                continue  # parameterless layer
            arrays = [np.asarray(lg[n]) for n in wnames]
            modules.extend(_classify_weight_group(wnames, arrays))
    return params_from_keras_modules(cfg, modules)


def _modules_from_keras_model(model) -> List[KerasModule]:
    """Walk a live keras model's layers (keras 3 API) in model order."""
    modules: List[KerasModule] = []

    def visit(layer):
        kind = type(layer).__name__
        if kind == "Bidirectional":
            modules.append(
                (
                    "bigru",
                    {
                        "fwd": [np.asarray(w) for w in layer.forward_layer.get_weights()],
                        "bwd": [np.asarray(w) for w in layer.backward_layer.get_weights()],
                    },
                )
            )
        elif kind == "TimeDistributed":
            visit(layer.layer)
        elif kind == "Conv2D":
            modules.append(("conv", [np.asarray(w) for w in layer.get_weights()]))
        elif kind == "BatchNormalization":
            modules.append(("bn", [np.asarray(w) for w in layer.get_weights()]))
        elif kind == "Dense":
            modules.append(("dense", [np.asarray(w) for w in layer.get_weights()]))
        # pooling / activation / reshape / permute / dropout: no parameters

    for layer in model.layers:
        visit(layer)
    return modules


def load_keras_checkpoint(path: str, cfg: ModelConfig):
    """Read a keras SEDnet checkpoint and return ``(params, state)``.

    Legacy keras-2 HDF5 files (the reference lineage's format) parse
    directly via h5py; anything else (``.keras``, keras-3 full-model
    ``.h5``) loads through the installed keras and is walked layer by
    layer. Forward parity of the mapping is pinned by
    `tests/test_keras_import.py` (<= 1e-5 vs keras inference)."""
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            g = f["model_weights"] if "model_weights" in f else f
            legacy = "layer_names" in g.attrs
        if legacy:
            return load_keras_h5(path, cfg)
    import keras

    model = keras.saving.load_model(path, compile=False)
    return params_from_keras_modules(cfg, _modules_from_keras_model(model))

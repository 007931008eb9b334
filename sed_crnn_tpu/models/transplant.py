"""Torch-checkpoint import: migrate reference-trained weights into CRNN
pytrees.

Users of the reference repo hold torch/Lightning checkpoints of the v1/v2
models (`sed.py:82-112`, `crnn_lightning.py:41-73`). This module maps a torch
``state_dict`` onto `models/crnn.py` parameter/state pytrees so those
checkpoints run (inference, evaluation, fine-tuning) on TPU without torch in
the serving path. Layout conventions converted:

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
            "only the timepooled-v1/v2 presets accept torch checkpoints"
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
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning checkpoints pickle hyper_parameters as an AttributeDict,
        # which the weights-only unpickler rejects; these files come from the
        # user's own training runs, so fall back to a full unpickle.
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    elif isinstance(obj, dict) and "model" in obj and all(
        hasattr(v, "shape") for v in obj["model"].values()
    ):
        obj = obj["model"]
    return params_from_torch_state_dict(cfg, obj)

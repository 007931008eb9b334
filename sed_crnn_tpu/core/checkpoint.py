"""Pytree checkpointing to single-file npz, with resume support.

The reference only ever *writes* checkpoints (best-ER state_dicts,
`sed.py:196-199`; every-epoch Lightning files, `train_lightning.py:32-40`)
and has no resume path. Here checkpoints round-trip: arrays are stored under
their flattened tree paths plus a JSON metadata blob (step, epoch, fold, best
metric, RNG key), and `load_checkpoint` rebuilds the nested dict/list/tuple
structure, so training resumes exactly where it stopped.

Supported tree nodes: dict (string keys), list, tuple, and array leaves.
Each path component carries its parent-container tag (``d:``/``l:``/``t:``)
so the exact structure is recoverable without a pickled treedef.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_META_KEY = "__checkpoint_meta__"
_SEP = "/"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if _SEP in str(k):
                raise ValueError(f"dict key {k!r} may not contain {_SEP!r}")
            out.update(_flatten(v, f"{prefix}{_SEP}d:{k}" if prefix else f"d:{k}"))
    elif isinstance(tree, (list, tuple)):
        tag = "l" if isinstance(tree, list) else "t"
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{_SEP}{tag}:{i}" if prefix else f"{tag}:{i}"))
    elif tree is None:
        raise ValueError(f"None leaf at {prefix!r}: checkpoint trees may not hold None")
    else:
        out[prefix if prefix else ""] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    if set(flat) == {""}:
        return flat[""]

    # Intermediate representation: dict nodes {key: child}, with the
    # container kind recorded per node.
    class _Node:
        __slots__ = ("kind", "children")

        def __init__(self):
            self.kind = None
            self.children: Dict[Any, Any] = {}

    root = _Node()
    for path, value in flat.items():
        node = root
        parts = path.split(_SEP)
        for i, part in enumerate(parts):
            kind, _, key = part.partition(":")
            if node.kind is None:
                node.kind = kind
            elif node.kind != kind:
                raise ValueError(f"inconsistent container kinds at {path!r}")
            k = key if kind == "d" else int(key)
            if i == len(parts) - 1:
                node.children[k] = value
            else:
                child = node.children.get(k)
                if not isinstance(child, _Node):
                    child = _Node()
                    node.children[k] = child
                node = child

    def materialize(node):
        if not isinstance(node, _Node):
            return node
        items = {k: materialize(v) for k, v in node.children.items()}
        if node.kind == "d":
            return items
        seq = [items[i] for i in sorted(items)]
        return seq if node.kind == "l" else tuple(seq)

    return materialize(root)


def save_checkpoint(path: str, tree: Any, metadata: Optional[Dict] = None) -> str:
    """Atomic single-file save: write to a temp file then rename."""
    tree = jax.device_get(tree)
    flat = _flatten(tree)
    flat[_META_KEY] = np.frombuffer(
        json.dumps(metadata or {}).encode("utf-8"), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Tuple[Any, Dict]:
    data = np.load(path)
    meta: Dict = {}
    flat: Dict[str, np.ndarray] = {}
    for k in data.files:
        if k == _META_KEY:
            meta = json.loads(bytes(data[k]).decode("utf-8"))
        else:
            flat[k] = data[k]
    return _unflatten(flat), meta


def latest_checkpoint(directory: str, prefix: str = "") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    cands = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith(".npz")
    ]
    return max(cands, key=os.path.getmtime) if cands else None

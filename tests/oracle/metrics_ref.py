"""Numpy oracle for the segment-metric formulas (Mesaros et al. 2016), written
independently from the published definitions with the reference
implementation's two quirks deliberately reproduced: F1 pools ceil(N/block)
blocks while ER pools floor(N/block); ER's Nref denominator is unguarded."""

import numpy as np

_EPS = np.finfo(np.float64).eps


def _flat(a):
    a = np.asarray(a, dtype=np.float64)
    if a.ndim == 3:
        a = a.reshape(-1, a.shape[2])
    return a


def ref_f1_frame(o, t):
    o, t = _flat(o), _flat(t)
    tp = float(np.count_nonzero((2 * t - o) == 1))
    prec = tp / (o.sum() + _EPS)
    rec = tp / (t.sum() + _EPS)
    return 2 * prec * rec / (prec + rec + _EPS)


def ref_er_frame(o, t):
    o, t = _flat(o), _flat(t)
    fp = ((t == 0) & (o == 1)).sum(axis=1).astype(np.float64)
    fn = ((t == 1) & (o == 0)).sum(axis=1).astype(np.float64)
    s = np.minimum(fp, fn).sum()
    d = np.maximum(0.0, fn - fp).sum()
    i = np.maximum(0.0, fp - fn).sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        return (s + d + i) / t.sum()


def _pool(a, block, n_blocks):
    out = np.zeros((n_blocks, a.shape[1]))
    for b in range(n_blocks):
        seg = a[b * block : (b + 1) * block]
        out[b] = seg.max(axis=0) if len(seg) else 0.0
    return out


def ref_f1_1sec(o, t, block):
    o, t = _flat(o), _flat(t)
    nb = int(np.ceil(o.shape[0] / block))
    return ref_f1_frame(_pool(o, block, nb), _pool(t, block, nb))


def ref_er_1sec(o, t, block):
    o, t = _flat(o), _flat(t)
    nb = int(o.shape[0] / block)
    return ref_er_frame(_pool(o, block, nb), _pool(t, block, nb))

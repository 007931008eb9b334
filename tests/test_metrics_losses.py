"""Golden tests: on-device metrics vs the numpy oracle (reference
`metrics.py:14-74` semantics incl. quirks) and losses vs torch."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sed_crnn_tpu.ops import losses, metrics

from tests.oracle.metrics_ref import (
    ref_er_1sec,
    ref_er_frame,
    ref_f1_1sec,
    ref_f1_frame,
)


def _rand_bin(rng, shape, p):
    return (rng.random(shape) < p).astype(np.float32)


@pytest.mark.parametrize("shape", [(300, 1), (257, 6), (16, 32, 1)])
@pytest.mark.parametrize("density", [0.02, 0.3, 0.7])
def test_framewise_scores_match_oracle(rng, shape, density):
    o = _rand_bin(rng, shape, density)
    t = _rand_bin(rng, shape, density)
    np.testing.assert_allclose(
        float(metrics.f1_framewise(jnp.asarray(o), jnp.asarray(t))),
        ref_f1_frame(o, t),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(metrics.er_framewise(jnp.asarray(o), jnp.asarray(t))),
        ref_er_frame(o, t),
        atol=1e-6,
    )


@pytest.mark.parametrize("n,block", [(250, 5), (253, 5), (299, 50), (43, 43), (40, 43)])
def test_segment_scores_match_oracle_incl_partial_blocks(rng, n, block):
    """Exercises the ceil-vs-floor partial-block asymmetry: n not a multiple
    of block means F1 sees one more block than ER."""
    o = _rand_bin(rng, (n, 6), 0.2)
    t = _rand_bin(rng, (n, 6), 0.2)
    np.testing.assert_allclose(
        float(metrics.f1_segment(jnp.asarray(o), jnp.asarray(t), block)),
        ref_f1_1sec(o, t, block),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(metrics.er_segment(jnp.asarray(o), jnp.asarray(t), block)),
        ref_er_1sec(o, t, block),
        atol=1e-6,
    )


def test_compute_scores_contract(rng):
    o = _rand_bin(rng, (500, 1), 0.1)
    t = _rand_bin(rng, (500, 1), 0.1)
    s = metrics.compute_scores(jnp.asarray(o), jnp.asarray(t), 5)
    assert set(s) == {"f1_overall_1sec", "er_overall_1sec"}
    np.testing.assert_allclose(float(s["f1_overall_1sec"]), ref_f1_1sec(o, t, 5), atol=1e-6)


def test_er_empty_reference_parity(rng):
    """Reference divides by Nref with no guard: all-zero targets -> NaN/inf."""
    o = _rand_bin(rng, (100, 1), 0.3)
    t = np.zeros((100, 1), np.float32)
    got = float(metrics.er_framewise(jnp.asarray(o), jnp.asarray(t)))
    ref = ref_er_frame(o, t)
    assert np.isinf(got) and np.isinf(ref)  # FP present, Nref 0
    got0 = float(metrics.er_framewise(jnp.zeros((10, 1)), jnp.zeros((10, 1))))
    assert np.isnan(got0)  # 0/0


def test_bool_inputs_accepted(rng):
    o = _rand_bin(rng, (120, 3), 0.4).astype(bool)
    t = _rand_bin(rng, (120, 3), 0.4).astype(bool)
    np.testing.assert_allclose(
        float(metrics.f1_segment(jnp.asarray(o), jnp.asarray(t), 7)),
        ref_f1_1sec(o, t, 7),
        atol=1e-6,
    )


def test_all_scores_confusion_matrix(rng):
    o = _rand_bin(rng, (200, 1), 0.3)
    t = _rand_bin(rng, (200, 1), 0.3)
    s = metrics.all_scores(jnp.asarray(o), jnp.asarray(t), 5)
    tn, fp, fn, tp = (int(s[k]) for k in ("tn", "fp", "fn", "tp"))
    assert tn + fp + fn + tp == 200
    assert tp == int(np.logical_and(o == 1, t == 1).sum())


def test_class_wise_scores_match_per_column_oracle(rng):
    o = _rand_bin(rng, (300, 6), 0.2)
    t = _rand_bin(rng, (300, 6), 0.2)
    f1s, ers = metrics.class_wise_scores(jnp.asarray(o), jnp.asarray(t), 7)
    assert f1s.shape == ers.shape == (6,)
    for c in range(6):
        np.testing.assert_allclose(
            float(f1s[c]), ref_f1_1sec(o[:, c : c + 1], t[:, c : c + 1], 7), atol=1e-6
        )
        np.testing.assert_allclose(
            float(ers[c]), ref_er_1sec(o[:, c : c + 1], t[:, c : c + 1], 7), atol=1e-6
        )


def test_class_wise_report_masks_absent_classes(rng):
    """A class with no reference blocks must report None, not NaN/inf."""
    o = _rand_bin(rng, (300, 3), 0.2)
    t = _rand_bin(rng, (300, 3), 0.3)
    t[:, 1] = 0.0  # class 1 absent from the references
    rep = metrics.class_wise_report(jnp.asarray(o), jnp.asarray(t), 7)
    assert rep["present"] == [True, False, True]
    assert rep["er_1s"][1] is None and rep["f1_1s"][1] is None
    for c in (0, 2):
        np.testing.assert_allclose(
            rep["er_1s"][c], ref_er_1sec(o[:, c : c + 1], t[:, c : c + 1], 7), atol=1e-6
        )
        assert np.isfinite(rep["f1_1s"][c])


def test_threshold_sweep_matches_pointwise(rng):
    p = rng.random((400, 1)).astype(np.float32)
    t = _rand_bin(rng, (400, 1), 0.2)
    ths = np.linspace(0.1, 0.9, 9).astype(np.float32)
    f1s, ers = metrics.threshold_sweep(jnp.asarray(p), jnp.asarray(t), jnp.asarray(ths), 5)
    for i, th in enumerate(ths):
        o = (p > th).astype(np.float32)
        np.testing.assert_allclose(float(f1s[i]), ref_f1_1sec(o, t, 5), atol=1e-6)
        np.testing.assert_allclose(float(ers[i]), ref_er_1sec(o, t, 5), atol=1e-6)
    best = metrics.best_threshold(jnp.asarray(p), jnp.asarray(t), ths, 5)
    assert float(best["er"]) == pytest.approx(float(np.min(ers)))


def test_per_class_sweep_matches_oracle_grid(rng):
    """Every (threshold, class) cell of the per-class sweep tables equals the
    single-column oracle run at that point; the FP table counts floor-pooled
    false-positive blocks."""
    p = rng.random((300, 4)).astype(np.float32)
    t = _rand_bin(rng, (300, 4), 0.25)
    ths = np.linspace(0.2, 0.8, 7).astype(np.float32)
    f1s, ers, fps = metrics.threshold_sweep_per_class(
        jnp.asarray(p), jnp.asarray(t), jnp.asarray(ths), 7
    )
    assert f1s.shape == ers.shape == fps.shape == (7, 4)
    n_blocks = 300 // 7
    for i, th in enumerate(ths):
        o = (p > th).astype(np.float32)
        for c in range(4):
            np.testing.assert_allclose(
                float(f1s[i, c]),
                ref_f1_1sec(o[:, c : c + 1], t[:, c : c + 1], 7),
                atol=1e-6,
            )
            np.testing.assert_allclose(
                float(ers[i, c]),
                ref_er_1sec(o[:, c : c + 1], t[:, c : c + 1], 7),
                atol=1e-6,
            )
            of = o[: n_blocks * 7, c].reshape(n_blocks, 7).max(axis=1)
            tf = t[: n_blocks * 7, c].reshape(n_blocks, 7).max(axis=1)
            assert float(fps[i, c]) == float(np.sum((of == 1) & (tf == 0)))


def test_best_per_class_thresholds_single_class_equals_global(rng):
    """With one class, the per-class operating point IS the global sweep's."""
    p = rng.random((400, 1)).astype(np.float32)
    t = _rand_bin(rng, (400, 1), 0.2)
    ths = np.linspace(0.1, 0.9, 9).astype(np.float32)
    pc = metrics.best_per_class_thresholds(jnp.asarray(p), jnp.asarray(t), ths, 5)
    best = metrics.best_threshold(jnp.asarray(p), jnp.asarray(t), ths, 5)
    assert float(pc["thresholds"][0]) == pytest.approx(float(best["threshold"]))
    assert float(pc["er"]) == pytest.approx(float(best["er"]))
    assert float(pc["f1"]) == pytest.approx(float(best["f1"]))


def test_best_per_class_thresholds_beats_global_on_skewed_classes(rng):
    """Two classes calibrated at different scales: no single threshold serves
    both, so the per-class vector must strictly beat the global best ER."""
    n = 700
    t = _rand_bin(rng, (n, 2), 0.3)
    p = np.empty((n, 2), np.float32)
    # class 0 separates at ~0.25; class 1 separates at ~0.8
    p[:, 0] = np.where(t[:, 0] > 0, 0.4, 0.1)
    p[:, 1] = np.where(t[:, 1] > 0, 0.95, 0.65)
    p += rng.random((n, 2)).astype(np.float32) * 0.02
    ths = np.asarray([0.25, 0.5, 0.8], np.float32)
    pc = metrics.best_per_class_thresholds(jnp.asarray(p), jnp.asarray(t), ths, 5)
    best = metrics.best_threshold(jnp.asarray(p), jnp.asarray(t), jnp.asarray(ths), 5)
    assert float(pc["thresholds"][0]) == pytest.approx(0.25)
    assert float(pc["thresholds"][1]) == pytest.approx(0.8)
    assert float(pc["er"]) == pytest.approx(0.0, abs=1e-6)
    assert float(best["er"]) > float(pc["er"])  # global cannot serve both
    # the chosen per-class scores are the sweep-table cells at those points
    np.testing.assert_allclose(np.asarray(pc["class_er"]), [0.0, 0.0], atol=1e-6)


def test_best_per_class_thresholds_absent_class_minimizes_fp(rng):
    """A class with no reference positives has no per-class ER signal (0/0 by
    parity design); its threshold must fall back to minimizing false-positive
    blocks — the only way it can hurt the overall ER."""
    n = 350
    t = _rand_bin(rng, (n, 2), 0.3)
    t[:, 1] = 0.0  # class 1 absent
    p = np.empty((n, 2), np.float32)
    p[:, 0] = np.where(t[:, 0] > 0, 0.9, 0.1)
    p[:, 1] = rng.random(n).astype(np.float32)  # FPs shrink as th rises
    ths = np.asarray([0.2, 0.5, 0.9], np.float32)
    for objective in ("er", "f1"):
        pc = metrics.best_per_class_thresholds(
            jnp.asarray(p), jnp.asarray(t), ths, 5, objective=objective
        )
        assert float(pc["thresholds"][1]) == pytest.approx(0.9)
        assert bool(pc["class_present"][0]) and not bool(pc["class_present"][1])
        assert np.isfinite(float(pc["er"])) and np.isfinite(float(pc["f1"]))
    with pytest.raises(ValueError):
        metrics.best_per_class_thresholds(
            jnp.asarray(p), jnp.asarray(t), ths, 5, objective="accuracy"
        )


# ---------------- losses ----------------


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((64, 8, 1)).astype(np.float32) * 3
    targets = _rand_bin(rng, (64, 8, 1), 0.5)
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(targets))
    got = losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6)


def test_bce_extreme_logits_stable():
    logits = jnp.asarray([[-80.0], [80.0], [0.0]])
    targets = jnp.asarray([[0.0], [1.0], [1.0]])
    got = float(losses.bce_with_logits(logits, targets))
    assert np.isfinite(got)
    import jax

    g = jax.grad(lambda l: losses.bce_with_logits(l, targets))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_focal_matches_reference_formula(rng):
    """Oracle: the reference's focal definition (`crnn_lightning.py:31-35`)
    evaluated with torch ops."""
    logits = rng.standard_normal((32, 8, 1)).astype(np.float32) * 2
    targets = _rand_bin(rng, (32, 8, 1), 0.5)
    tl, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    pt = torch.sigmoid(tl)
    pt = torch.where(tt == 1, pt, 1 - pt)
    ref = (-0.25 * (1 - pt) ** 2.0 * torch.log(pt + 1e-12)).mean()
    got = losses.focal_bce(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6)


def test_make_loss_registry():
    assert losses.make_loss("bce") is losses.bce_with_logits
    f = losses.make_loss("focal", alpha=0.5, gamma=1.0)
    out = f(jnp.zeros((4, 1)), jnp.ones((4, 1)))
    np.testing.assert_allclose(float(out), 0.5 * 0.5 * np.log(2), atol=1e-5)
    with pytest.raises(ValueError):
        losses.make_loss("mse")

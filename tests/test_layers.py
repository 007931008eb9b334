"""Layer-level parity vs torch: Conv2d, BatchNorm2d (train + eval +
running-stat updates), max-pool, dropout statistics."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from sed_crnn_tpu.nn.layers import BatchNorm2d, Conv2d, Ctx, Dropout, max_pool2d


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv2d_matches_torch(rng):
    torch.manual_seed(0)
    tc = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref = _to_nhwc(tc(_nchw(x)))

    conv = Conv2d(3, 8, (3, 3))
    params = {
        "w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(tc.bias.detach().numpy()),
    }
    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_batchnorm_train_and_eval_match_torch(rng):
    torch.manual_seed(1)
    tb = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        tb.weight.uniform_(0.5, 1.5)
        tb.bias.uniform_(-0.5, 0.5)

    bn = BatchNorm2d(5)
    params = {
        "scale": jnp.asarray(tb.weight.detach().numpy()),
        "bias": jnp.asarray(tb.bias.detach().numpy()),
    }
    state = {"mean": jnp.zeros(5), "var": jnp.ones(5)}

    # two train steps: outputs AND running stats must track torch
    for seed in (0, 1):
        x = rng.standard_normal((4, 6, 7, 5)).astype(np.float32)
        tb.train()
        ref = _to_nhwc(tb(_nchw(x)))
        got, state = bn.apply(params, state, jnp.asarray(x), Ctx(train=True))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(state["mean"]), tb.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state["var"]), tb.running_var.numpy(), atol=1e-5
    )

    # eval uses running stats
    x = rng.standard_normal((4, 6, 7, 5)).astype(np.float32)
    tb.eval()
    with torch.no_grad():
        ref = _to_nhwc(tb(_nchw(x)))
    got, _ = bn.apply(params, state, jnp.asarray(x), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_cross_replica_batchnorm_equals_global_batch(rng):
    """BN with psum over an 8-device mesh == BN over the concatenated batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    bn = BatchNorm2d(4)
    params = {"scale": jnp.ones(4) * 1.3, "bias": jnp.ones(4) * 0.2}
    state = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
    x = rng.standard_normal((16, 3, 5, 4)).astype(np.float32)

    ref, ref_state = bn.apply(params, state, jnp.asarray(x), Ctx(train=True))

    def sharded(xs):
        y, st = bn.apply(params, state, xs, Ctx(train=True, axis_name="data"))
        return y, st

    f = shard_map(
        sharded,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P()),
    )
    got, got_state = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_state["var"]), np.asarray(ref_state["var"]), atol=1e-5
    )


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    ref = _to_nhwc(torch.nn.MaxPool2d((1, 2))(_nchw(x)))
    got = np.asarray(max_pool2d(jnp.asarray(x), (1, 2)))
    np.testing.assert_allclose(got, ref, atol=0)

    ref5 = _to_nhwc(torch.nn.MaxPool2d((5, 1))(_nchw(x)))
    got5 = np.asarray(max_pool2d(jnp.asarray(x), (5, 1)))
    np.testing.assert_allclose(got5, ref5, atol=0)


def test_dropout_statistics_and_eval_identity(rng):
    drop = Dropout(0.5)
    x = jnp.ones((1000, 100))
    out = drop.apply(x, Ctx(train=True, rng=jax.random.PRNGKey(0)))
    kept = np.asarray(out != 0)
    assert abs(kept.mean() - 0.5) < 0.02
    np.testing.assert_allclose(np.asarray(out).mean(), 1.0, atol=0.05)
    # eval = identity
    np.testing.assert_array_equal(np.asarray(drop.apply(x, Ctx(train=False))), np.asarray(x))


def test_dropout_rate_one_returns_zeros():
    import jax

    from sed_crnn_tpu.nn.layers import Ctx, Dropout

    x = jnp.ones((4, 8), jnp.float32)
    y = Dropout(1.0).apply(x, Ctx(train=True, rng=jax.random.PRNGKey(0)))
    assert float(jnp.sum(jnp.abs(y))) == 0.0


def test_maxpool_backward_matches_naive_reshape(rng):
    """The lane-folded pool's custom VJP (`nn/layers.py::_max_pool_lanes`)
    must route gradients exactly like the naive reshape+max formulation on
    tie-free inputs, for both the pw=2 (timepooled) and pw=5 (sednet
    mel-pool) window widths, including ragged-edge truncation."""
    for pw in (2, 5):
        w = 3 * pw + 1  # ragged edge exercises the floor-truncation slice
        x = rng.standard_normal((2, 4, w, 3)).astype(np.float32)
        cot = rng.standard_normal((2, 4, w // pw, 3)).astype(np.float32)

        def fused(x, cot=cot, pw=pw):
            return jnp.sum(max_pool2d(x, (1, pw)) * cot)

        def naive(x, cot=cot, pw=pw):
            b, h, wd, c = x.shape
            r = x[:, :, : (wd // pw) * pw, :].reshape(b, h, wd // pw, pw, c)
            return jnp.sum(r.max(axis=3) * cot)

        g_fused = np.asarray(jax.grad(fused)(jnp.asarray(x)))
        g_naive = np.asarray(jax.grad(naive)(jnp.asarray(x)))
        np.testing.assert_allclose(g_fused, g_naive, atol=0, err_msg=f"pw={pw}")


def test_maxpool_backward_ties_go_to_first_element():
    """Torch MaxPool2d routes the gradient to the FIRST maximal element of a
    tied window; the custom VJP must do the same (the naive reduce_max
    backward would split it across ties)."""
    for pw in (2, 5):
        x = jnp.ones((1, 1, 2 * pw, 1), jnp.float32)
        g = np.asarray(
            jax.grad(lambda x: jnp.sum(max_pool2d(x, (1, pw))))(x)
        )[0, 0, :, 0]
        expect = np.zeros(2 * pw, np.float32)
        expect[0] = 1.0
        expect[pw] = 1.0
        np.testing.assert_array_equal(g, expect)


def test_keras_init_scheme():
    """The keras-lineage init: glorot kernels with zero biases for
    conv/dense, and a semi-orthogonal GRU recurrent kernel (orthonormal
    rows) with zero biases — the keras-2.2 defaults the flagship SEDnet
    trained under. Measured to change convergence speed materially
    (scripts/parity_sednet_keras.py), so it is pinned by test."""
    from sed_crnn_tpu.nn.gru import GRU
    from sed_crnn_tpu.nn.layers import Dense

    key = jax.random.PRNGKey(0)
    conv = Conv2d(8, 16, (3, 3), init_scheme="keras").init(key)
    assert np.all(np.asarray(conv["b"]) == 0)
    bound = np.sqrt(6.0 / (8 * 9 + 16 * 9))
    w = np.asarray(conv["w"])
    assert np.abs(w).max() <= bound and np.abs(w).max() > 0.8 * bound

    dense = Dense(10, 4, init_scheme="keras").init(key)
    assert np.all(np.asarray(dense["b"]) == 0)
    assert np.abs(np.asarray(dense["w"])).max() <= np.sqrt(6.0 / 14)

    cell = GRU(12, 6, reset_after=False, init_scheme="keras")
    p = cell.init(key)
    wh = np.asarray(p["wh"])  # (H, 3H), rows orthonormal
    np.testing.assert_allclose(wh @ wh.T, np.eye(6), atol=1e-5)
    assert np.all(np.asarray(p["bi"]) == 0)

    # the sednet presets carry the scheme end to end
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models import get_model

    model = get_model(get_preset("sednet-dcase").model)
    params, _ = model.init(key)
    assert np.all(np.asarray(params["conv"][0]["b"]) == 0)
    g0 = params["gru"][0]["fwd"]["wh"]
    np.testing.assert_allclose(
        np.asarray(g0) @ np.asarray(g0).T, np.eye(32), atol=1e-5
    )


def test_remat_trunk_matches_baseline_forward_and_grad():
    """`ModelConfig.remat_trunk` is a scheduling knob: identical forward
    logits, BN state updates, and gradients — only the backward's memory
    plan changes (`models/crnn.py` wraps the conv trunk in
    `jax.checkpoint`)."""
    import dataclasses

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.ops.losses import bce_with_logits

    base_cfg = dataclasses.replace(
        get_preset("sednet-dcase").model,
        seq_len_in=32, conv_channels=(8, 8), pool=(5, 2), gru_hidden=(4,),
        head_dims=(4, 6),
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 40)), jnp.float32
    )
    y = (np.random.default_rng(1).random((2, 32, 6)) > 0.7).astype(np.float32)

    outs = []
    for remat in (False, True):
        model = get_model(dataclasses.replace(base_cfg, remat_trunk=remat))
        params, state = model.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            logits, new_state, _ = model.apply(
                p, state, x, Ctx(train=True, rng=jax.random.PRNGKey(7))
            )
            return bce_with_logits(logits, jnp.asarray(y)), (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        outs.append((float(loss), logits, new_state, grads))

    # remat changes XLA fusion boundaries, so f32 accumulation order
    # shifts a few ULPs; the comparison is tight-allclose, not bit-equal.
    (l0, lg0, st0, g0), (l1, lg1, st1, g1) = outs
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lg0), np.asarray(lg1), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(st0), jax.tree.leaves(st1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        )

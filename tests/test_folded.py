"""Lane-folded batch layout (`models/folded.py`) vs the plain layout.

The folded layout claims to be a pure LAYOUT change: identical parameter
tree, identical math (block-diagonal conv kernels contribute exact-zero
cross terms, fold-aware BN reduces per TRUE channel, dropout masks are
drawn in the plain shape then folded). These tests pin that contract:
outputs/grads of the folded model must match the plain model within f32
rounding, with bit-identical parameter trees and dropout masks.

Reference config this optimization serves: the default b32 training shape
(`/root/reference/srcs/cli/train.py:66-68`); measured 3.1x stage-1
fwd+bwd and 2.1x whole-step on the live chip
(`tools/microbench_folded_stage1.py`, docs/performance.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from leaffliction_tpu.models import folded
from leaffliction_tpu.models.leafcnn import build_leafcnn


def test_auto_fold():
    # b32, stage widths of the base preset
    assert folded.auto_fold(32, 32) == 4
    assert folded.auto_fold(32, 64) == 2
    assert folded.auto_fold(32, 128) == 1
    assert folded.auto_fold(32, 256) == 1
    # batch floor: keep N/G >= 8 so dp<=8 meshes still fold locally
    assert folded.auto_fold(16, 32) == 2
    assert folded.auto_fold(8, 32) == 1
    # indivisible batches never fold
    assert folded.auto_fold(30, 32) == 2  # 30 % 2 == 0, 30 % 4 != 0
    assert folded.auto_fold(31, 32) == 1
    # batch cap: large batches are MXU-throughput-bound — the block-diag
    # zero MACs cost real time there (b128 regression, BENCH_r05 notes)
    assert folded.auto_fold(128, 32) == 1
    assert folded.auto_fold(64, 32) == 1


def test_auto_fold_cap_env(monkeypatch):
    monkeypatch.setenv("LEAF_LANE_FOLD_MAX_BATCH", "128")
    assert folded.auto_fold(128, 32) == 4
    monkeypatch.setenv("LEAF_LANE_FOLD_MAX_BATCH", "0")
    assert folded.auto_fold(16, 32) == 1


def test_fold_unfold_roundtrip():
    x = jnp.arange(4 * 2 * 3 * 5, dtype=jnp.float32).reshape(4, 2, 3, 5)
    for g in (1, 2, 4):
        y = folded.fold(x, g)
        assert y.shape == (4 // g, 2, 3, g * 5)
        np.testing.assert_array_equal(np.asarray(folded.unfold(y, g)),
                                      np.asarray(x))
    # lane layout: image n'*g+i occupies lane block i
    y = folded.fold(x, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, :5]),
                                  np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 5:]),
                                  np.asarray(x[1]))


def test_block_diag_kernel():
    w = jax.random.normal(jax.random.key(0), (3, 3, 2, 4), jnp.float32)
    bd = folded.block_diag_kernel(w, 3)
    assert bd.shape == (3, 3, 6, 12)
    for i in range(3):
        blk = bd[:, :, 2 * i:2 * (i + 1), 4 * i:4 * (i + 1)]
        np.testing.assert_array_equal(np.asarray(blk), np.asarray(w))
    # off-diagonal blocks are exact zeros
    np.testing.assert_array_equal(np.asarray(bd[:, :, :2, 4:8]), 0.0)


@pytest.mark.parametrize("g", [2, 4])
def test_folded_conv_matches_plain(g):
    n, h, w, cin, cout = 8, 6, 6, 8, 16
    x = jax.random.normal(jax.random.key(1), (n, h, w, cin), jnp.float32)
    conv = folded.Conv(cout, (3, 3))
    v = conv.init(jax.random.key(2), x)
    y_plain = conv.apply(v, x)  # fold=1
    y_fold = folded.unfold(conv.apply(v, folded.fold(x, g), fold=g), g)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_plain),
                               rtol=1e-6, atol=1e-6)
    # param tree matches flax's nn.Conv naming/shape (checkpoint parity)
    ref = nn.Conv(cout, (3, 3), padding="SAME", use_bias=False)
    vr = ref.init(jax.random.key(2), x)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v)
            == jax.tree_util.tree_map(lambda a: a.shape, vr))
    # identical init bits (same rng consumption, same initializer)
    np.testing.assert_array_equal(np.asarray(v["params"]["kernel"]),
                                  np.asarray(vr["params"]["kernel"]))


def test_folded_depthwise_conv_matches_plain():
    g, n, h, w, c = 2, 8, 6, 6, 8
    x = jax.random.normal(jax.random.key(3), (n, h, w, c), jnp.float32)
    conv = folded.Conv(c, (3, 3), feature_group_count=c)
    v = conv.init(jax.random.key(4), x)
    y_plain = conv.apply(v, x)
    y_fold = folded.unfold(conv.apply(v, folded.fold(x, g), fold=g), g)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_plain),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("broadcast_dims", [(), (1, 2)])
def test_folded_dropout_mask_bit_identical(broadcast_dims):
    g, n, h, w, c = 4, 16, 4, 4, 8
    x = jnp.ones((n, h, w, c), jnp.float32)
    drop = folded.Dropout(0.5, broadcast_dims=broadcast_dims,
                          deterministic=False)
    rngs = {"dropout": jax.random.key(9)}
    y_plain = drop.apply({}, x, rngs=rngs)
    y_fold = folded.unfold(
        drop.apply({}, folded.fold(x, g), fold=g, rngs=rngs), g)
    # bit-identical: same bernoulli draw in the plain shape, folded after
    np.testing.assert_array_equal(np.asarray(y_fold), np.asarray(y_plain))
    # and matches flax's own Dropout exactly in plain mode
    ref = nn.Dropout(0.5, broadcast_dims=broadcast_dims,
                     deterministic=False)
    np.testing.assert_array_equal(np.asarray(y_plain),
                                  np.asarray(ref.apply({}, x, rngs=rngs)))


def _leafcnn_pair(**kw):
    m_fold = build_leafcnn(num_classes=8, scale="tiny", lane_fold=True, **kw)
    m_plain = build_leafcnn(num_classes=8, scale="tiny", lane_fold=False,
                            **kw)
    return m_fold, m_plain


def test_leafcnn_folded_param_tree_identical():
    x = jnp.zeros((16, 32, 32, 3), jnp.float32)
    m_fold, m_plain = _leafcnn_pair()
    vf = m_fold.init(jax.random.key(0), x, train=False)
    vp = m_plain.init(jax.random.key(0), x, train=False)
    sf = jax.tree_util.tree_map(lambda a: a.shape, vf)
    sp = jax.tree_util.tree_map(lambda a: a.shape, vp)
    assert sf == sp
    # identical init VALUES too: same rng stream, same initializers
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), vf, vp)


@pytest.mark.parametrize("train", [False, True])
def test_leafcnn_folded_forward_matches_plain(train):
    x = jax.random.uniform(jax.random.key(5), (16, 32, 32, 3), jnp.float32)
    m_fold, m_plain = _leafcnn_pair()
    v = m_plain.init(jax.random.key(0), x, train=False)
    kw = {}
    if train:
        kw = {"rngs": {"dropout": jax.random.key(7)},
              "mutable": ["batch_stats"]}
    yf = m_fold.apply(v, x, train=train, **kw)
    yp = m_plain.apply(v, x, train=train, **kw)
    if train:
        yf, statsf = yf
        yp, statsp = yp
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
            statsf, statsp)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_leafcnn_folded_grads_match_plain():
    x = jax.random.uniform(jax.random.key(6), (16, 32, 32, 3), jnp.float32)
    labels = jnp.arange(16) % 8
    m_fold, m_plain = _leafcnn_pair()
    v = m_plain.init(jax.random.key(0), x, train=False)
    aux = {k: v[k] for k in v if k != "params"}

    def loss(model, params):
        logits, _ = model.apply(
            {"params": params, **aux}, x, train=True,
            rngs={"dropout": jax.random.key(8)}, mutable=["batch_stats"])
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(lp[jnp.arange(16), labels])

    lf, gf = jax.value_and_grad(lambda p: loss(m_fold, p))(v["params"])
    lp_, gp = jax.value_and_grad(lambda p: loss(m_plain, p))(v["params"])
    np.testing.assert_allclose(float(lf), float(lp_), rtol=1e-5, atol=1e-6)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_p[path]),
            rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("strides", [(1, 1), (2, 2)])
def test_folded_strided_conv_matches_plain(strides):
    g, n, h, w, cin, cout = 2, 8, 8, 8, 8, 16
    x = jax.random.normal(jax.random.key(11), (n, h, w, cin), jnp.float32)
    conv = folded.Conv(cout, (3, 3), strides=strides)
    v = conv.init(jax.random.key(12), x)
    y_plain = conv.apply(v, x)
    y_fold = folded.unfold(conv.apply(v, folded.fold(x, g), fold=g), g)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_plain),
                               rtol=1e-6, atol=1e-6)
    # strided SAME semantics match flax nn.Conv
    ref = nn.Conv(cout, (3, 3), strides=strides, padding="SAME",
                  use_bias=False)
    np.testing.assert_allclose(np.asarray(y_plain),
                               np.asarray(ref.apply(v, x)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stem", ["conv", "s2d"])
def test_resnet_folded_matches_plain(stem):
    from leaffliction_tpu.models.resnet import build_resnet

    x = jax.random.uniform(jax.random.key(13), (16, 64, 64, 3), jnp.float32)
    m_fold = build_resnet(num_classes=8, preset="resnet10", stem=stem,
                          lane_fold=True, dtype=jnp.float32)
    m_plain = build_resnet(num_classes=8, preset="resnet10", stem=stem,
                           lane_fold=False, dtype=jnp.float32)
    vf = m_fold.init(jax.random.key(0), x, train=False)
    vp = m_plain.init(jax.random.key(0), x, train=False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, vf)
            == jax.tree_util.tree_map(lambda a: a.shape, vp))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), vf, vp)
    yf = m_fold.apply(vp, x, train=False)
    yp = m_plain.apply(vp, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    # train path: stats + logits agree
    rngs = {"dropout": jax.random.key(2)}
    yf, sf = m_fold.apply(vp, x, train=True, rngs=rngs,
                          mutable=["batch_stats"])
    yp, sp = m_plain.apply(vp, x, train=True, rngs=rngs,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), sf, sp)


def test_lane_fold_env_kill_switch(monkeypatch):
    x = jax.random.uniform(jax.random.key(5), (16, 32, 32, 3), jnp.float32)
    m_fold, m_plain = _leafcnn_pair()
    v = m_plain.init(jax.random.key(0), x, train=False)
    monkeypatch.setenv("LEAF_LANE_FOLD", "0")
    y_off = m_fold.apply(v, x, train=False)
    y_plain = m_plain.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_plain))


def test_auto_fold_dp_aware():
    """The fold decision acts on the PER-DEVICE batch under dp sharding.

    A global b256 over dp=8 is per-device b32 — the reference-default
    shape where folding wins 2.11× — and must fold without the
    LEAF_LANE_FOLD_MAX_BATCH escape hatch."""
    assert folded.auto_fold(256, 32, dp=8) == 4
    assert folded.auto_fold(256, 64, dp=8) == 2
    assert folded.auto_fold(256, 128, dp=8) == 1
    # dp=1 (single chip) unchanged: b256 is over the cap
    assert folded.auto_fold(256, 32) == 1
    # per-device batch above the cap still refuses (1024/8 = 128 > 32)
    assert folded.auto_fold(1024, 32, dp=8) == 1
    # batch not divisible by dp: global-batch decision (no fold here)
    assert folded.auto_fold(100, 32, dp=8) == 1
    # divisibility acts per device: 64/4=16 → G=2 at width 32
    assert folded.auto_fold(64, 32, dp=4) == 2


def test_folded_dp_sharded_matches_plain():
    """fold_dp model under a real dp-sharded mesh == plain model.

    Pins two claims from folded.auto_fold's docstring: the fold is a
    shard-local reshape (G consecutive images stay on one device), and a
    dp-sharded global batch above the single-chip cap still folds."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices (conftest forces 8 virtual CPU)")
    mesh = Mesh(np.asarray(devs[:8]).reshape(8), ("data",))
    n = 128  # per-device 16 → G=2 at tiny widths; unfolded at dp=1
    x = jax.random.uniform(jax.random.key(5), (n, 24, 24, 3), jnp.float32)
    m_fold = build_leafcnn(num_classes=8, scale="tiny", fold_dp=8)
    m_plain = build_leafcnn(num_classes=8, scale="tiny", lane_fold=False)
    v = m_plain.init(jax.random.key(0), x[:16], train=False)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    yf = jax.jit(lambda v_, x_: m_fold.apply(v_, x_, train=False))(vs, xs)
    yp = m_plain.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)

    # train mode across the mesh: the fold-aware BN batch statistics
    # reduce over the SHARDED batch dim (XLA inserts the psum) and the
    # dropout masks are drawn in the plain shape — both must reproduce
    # the unsharded plain model exactly (within f32 reassociation)
    def train_apply(model):
        def f(v_, x_):
            return model.apply(v_, x_, train=True,
                               rngs={"dropout": jax.random.key(7)},
                               mutable=["batch_stats"])
        return f

    yf, sf = jax.jit(train_apply(m_fold))(vs, xs)
    yp, sp = train_apply(m_plain)(v, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), sf, sp)

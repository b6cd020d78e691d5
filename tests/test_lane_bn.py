"""LaneBN == flax BatchNorm: values, gradients, running statistics.

The lane-folded BatchNorm (ops/lane_bn.py) must be numerically
interchangeable with ``nn.BatchNorm`` — same formula, different f32
reduction order — across the train path (custom_vjp), the fallback
path (non-foldable channel counts), and the eval path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from uda_aerial_semantic_segmentation_research_tpu.ops.lane_bn import (
    LaneBN, _foldable,
)

KW = dict(momentum=0.9, epsilon=1e-5, dtype=jnp.bfloat16,
          param_dtype=jnp.float32)


def _pair(c, lane="auto"):
    return (nn.BatchNorm(use_running_average=False, **KW),
            LaneBN(use_running_average=False, lane=lane, **KW))


def _data(c, shape=(4, 8, 8)):
    rng = np.random.RandomState(c)
    x = jnp.asarray(rng.randn(*shape, c) * 2.0 + 0.5, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    dy = jnp.asarray(rng.randn(*shape, c), jnp.bfloat16)
    return x, scale, bias, dy


@pytest.mark.parametrize("c", [16, 64, 256, 24])
def test_train_matches_flax(c):
    ref, lane = _pair(c)
    x, scale, bias, dy = _data(c)
    vars_ = {"params": {"scale": scale, "bias": bias},
             "batch_stats": {"mean": jnp.full((c,), 0.3),
                             "var": jnp.full((c,), 2.0)}}

    def run(mod):
        def f(v, x):
            y, upd = mod.apply(v, x, mutable=["batch_stats"])
            return y, upd["batch_stats"]
        y, pull = jax.vjp(lambda v, x: f(v, x)[0], vars_, x)
        _, bs = f(vars_, x)
        dv, dx = pull(dy)
        return y, bs, dv["params"], dx

    y_r, bs_r, dp_r, dx_r = run(ref)
    y_l, bs_l, dp_l, dx_l = run(lane)
    np.testing.assert_allclose(np.float32(y_l), np.float32(y_r),
                               rtol=0, atol=2e-2)   # bf16 output quantum
    for k in ("mean", "var"):
        np.testing.assert_allclose(bs_l[k], bs_r[k], rtol=2e-5, atol=2e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(dp_l[k], dp_r[k], rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.float32(dx_l), np.float32(dx_r),
                               rtol=0, atol=2e-2)


def test_foldable_predicate():
    assert _foldable(jnp.zeros((2, 8, 8, 16)), 16)
    assert _foldable(jnp.zeros((2, 8, 8, 256)), 256)
    assert not _foldable(jnp.zeros((2, 8, 8, 24)), 24)   # 128 % 24 != 0
    assert not _foldable(jnp.zeros((3, 16)), 16)         # 48 elems % 128


def test_eval_matches_flax():
    c = 32
    x, scale, bias, _ = _data(c)
    vars_ = {"params": {"scale": scale, "bias": bias},
             "batch_stats": {"mean": jnp.full((c,), 0.25),
                             "var": jnp.full((c,), 1.5)}}
    ref = nn.BatchNorm(use_running_average=True, **KW)
    lane = LaneBN(use_running_average=True, **KW)
    np.testing.assert_allclose(np.float32(lane.apply(vars_, x)),
                               np.float32(ref.apply(vars_, x)),
                               rtol=1 / 128, atol=1e-2)  # one bf16 ulp


def test_variable_tree_matches_flax():
    c = 16
    x = jnp.zeros((2, 4, 4, c), jnp.bfloat16)
    vr = nn.BatchNorm(use_running_average=False, **KW).init(
        jax.random.PRNGKey(0), x)
    vl = LaneBN(use_running_average=False, **KW).init(
        jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vl)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(vr),
            jax.tree_util.tree_leaves_with_path(vl)):
        assert pa == pb and a.shape == b.shape and a.dtype == b.dtype


def test_grad_through_loss_scalar():
    """End-to-end grad check at f32 where tolerances are tight."""
    c = 16
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, c), jnp.float32)
    kw = dict(momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
              param_dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, **kw)
    lane = LaneBN(use_running_average=False, **kw)
    v = {"params": {"scale": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
                    "bias": jnp.asarray(rng.randn(c), jnp.float32)}}
    v = {**v, "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}}

    def loss(mod, v, x):
        y, _ = mod.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(y) * y)

    gr = jax.grad(lambda v, x: loss(ref, v, x), argnums=(0, 1))(v, x)
    gl = jax.grad(lambda v, x: loss(lane, v, x), argnums=(0, 1))(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gl)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_lane_path_under_remat():
    """phase 3 wraps decoder blocks in nn.remat: the custom_vjp lane
    path must produce identical gradients when rematerialized."""
    c = 16
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, c), jnp.float32)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    from uda_aerial_semantic_segmentation_research_tpu.ops.lane_bn import (
        _bn_train,
    )
    assert _foldable(x, c)

    def f(x, s, b):
        y, _, _ = _bn_train(1e-5, jnp.float32, x, s, b)
        return jnp.sum(y * jnp.cos(y))

    g_plain = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
    g_remat = jax.grad(jax.checkpoint(f), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_f32_input_bf16_norm_stats_match_flax():
    """Review regression: stats must come from the RAW input upcast to
    f32 (flax contract), not from the input quantized to the module
    dtype, even on the foldable lane path."""
    c = 16
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, c) * 2 + 0.5, jnp.float32)
    v = {"params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
         "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}}
    ref = nn.BatchNorm(use_running_average=False, **KW)
    lane = LaneBN(use_running_average=False, **KW)
    _, bs_r = ref.apply(v, x, mutable=["batch_stats"])
    _, bs_l = lane.apply(v, x, mutable=["batch_stats"])
    for k in ("mean", "var"):
        np.testing.assert_allclose(bs_l["batch_stats"][k],
                                   bs_r["batch_stats"][k],
                                   rtol=1e-6, atol=1e-6)


def test_missing_mutable_fails_loud():
    """Review regression: like flax, a train-mode apply without
    mutable=['batch_stats'] must raise, not silently freeze stats."""
    c = 16
    x = jnp.zeros((2, 4, 4, c), jnp.bfloat16)
    v = {"params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
         "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}}
    import flax.errors
    with pytest.raises(flax.errors.ModifyScopeVariableError):
        LaneBN(use_running_average=False, **KW).apply(v, x)

"""Interpreter parity for the plan-B Pallas lane-sum kernels."""

import jax.numpy as jnp
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.ops.pallas_moments import (
    lane_dual_sums, lane_sums,
)


def test_lane_sums_matches_numpy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2048, 128), jnp.bfloat16)
    s, q = lane_sums(x, interpret=True)
    x32 = np.float32(x)
    np.testing.assert_allclose(s, x32.sum(0), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(q, (x32 * x32).sum(0), rtol=1e-5, atol=1e-3)


def test_lane_sums_odd_rows_single_block():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(96, 128), jnp.float32)   # 96 % 512 != 0
    s, q = lane_sums(x, interpret=True)
    np.testing.assert_allclose(s, np.float32(x).sum(0), rtol=1e-5, atol=1e-4)


def test_lane_dual_sums_matches_numpy():
    rng = np.random.RandomState(2)
    dy = jnp.asarray(rng.randn(1024, 128), jnp.bfloat16)
    x = jnp.asarray(rng.randn(1024, 128), jnp.bfloat16)
    s, p = lane_dual_sums(dy, x, interpret=True)
    dy32, x32 = np.float32(dy), np.float32(x)
    np.testing.assert_allclose(s, dy32.sum(0), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(p, (dy32 * x32).sum(0), rtol=1e-5, atol=1e-3)

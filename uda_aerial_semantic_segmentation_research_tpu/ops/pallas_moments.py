"""Pallas lane-sum kernels: plan B for the lane-folded BatchNorm.

``ops/lane_bn.py`` expresses its full-lane-occupancy reductions as XLA
``reshape + sum`` over a ``(T/128, 128)`` flat view.  If XLA's lowering
of that reduce fails to reach HBM bandwidth on the real chip (e.g. it
inserts a layout copy for the reshape), these kernels are the drop-in
replacement: a single grid sweep over row blocks accumulating per-lane
f32 partial sums in VMEM.

Two entry points mirror lane_bn's two traversals:
  - ``lane_sums(x)``        -> (sum, sumsq) per lane     (forward stats)
  - ``lane_dual_sums(dy,x)``-> (sum_dy, sum_dy_x) per lane (backward)

Both take a 2-D ``(M, 128)`` array (any float dtype) and return
``(128,)`` f32 vectors; the caller folds lanes to channels exactly as
``lane_bn._fold_sums`` does.  Not wired into production by default —
status: interpreter-parity-tested on CPU (tests/test_pallas_moments.py);
on-chip A/B pending TPU availability (see BASELINE.md r3 ledger).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
# rows per grid step: 512 rows x 128 lanes x 4B (f32 upcast) = 256 KB
# per input block -- small against ~16 MB VMEM, large enough that the
# grid loop overhead vanishes
BLOCK_M = 512


def _sums_kernel(x_ref, s_ref, q_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    x = x_ref[...].astype(jnp.float32)
    s_ref[...] += jnp.sum(x, axis=0, keepdims=True)
    q_ref[...] += jnp.sum(x * x, axis=0, keepdims=True)


def _dual_kernel(dy_ref, x_ref, s_ref, p_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        p_ref[...] = jnp.zeros_like(p_ref)

    dy = dy_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    s_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    p_ref[...] += jnp.sum(dy * x, axis=0, keepdims=True)


def _grid_for(m: int):
    """(grid, block_rows) with block_rows bounded by BLOCK_M.

    Picks the largest power-of-two divisor of ``m`` up to BLOCK_M so a
    non-aligned row count can never stage the whole array into VMEM
    (BLOCK_M x 128 x 4 B = 256 KB is the hard per-block ceiling).
    """
    bm = BLOCK_M
    while m % bm:
        bm //= 2
    return (m // bm,), bm


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_sums(x, interpret: bool = False):
    """(M, 128) -> ((128,) sum, (128,) sum of squares), f32 accumulate."""
    m, lanes = x.shape
    grid, bm = _grid_for(m)
    out = pl.pallas_call(
        _sums_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, lanes), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((1, lanes), lambda i: (0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, lanes), jnp.float32)] * 2,
        interpret=interpret,
    )(x)
    return out[0][0], out[1][0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_dual_sums(dy, x, interpret: bool = False):
    """((M,128), (M,128)) -> ((128,) sum dy, (128,) sum dy*x)."""
    m, lanes = x.shape
    grid, bm = _grid_for(m)
    out = pl.pallas_call(
        _dual_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, lanes), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((1, lanes), lambda i: (0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, lanes), jnp.float32)] * 2,
        interpret=interpret,
    )(dy, x)
    return out[0][0], out[1][0]

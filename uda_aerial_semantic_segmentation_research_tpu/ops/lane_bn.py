"""BatchNorm with lane-folded statistics reductions.

Drop-in replacement for ``flax.linen.BatchNorm`` (same constructor
surface as used in this package, same parameter/``batch_stats``
variable tree, same float32 statistics / fast-variance / output-cast
numerics) whose per-channel reductions are restructured for the TPU
vector unit.

Why it was built: the r3 profile (BASELINE.md) showed BatchNorm
statistics passes as the single largest step-time bucket — 140.6
ms/step at B=128 @ 512px — at only ~310-400 GB/s effective, and the
working theory was lane underuse (C=16-64 minor in an (8, 128) vector
tile).  The folded path reduces a *flat* ``(T / 128, 128)`` view at
full lane occupancy, then folds the ``(128,)`` result to ``(C,)``;
a ``jax.custom_vjp`` applies the same trick to the two backward sums
(``sum(dy)``, ``sum(dy * x)``) and leaves the input gradient as a
per-channel FMA (``dx = a*dy + c*x + d``) that XLA fuses onward.

MEASURED ON-CHIP VERDICT (r3 session 4, v5e): the premise was wrong,
and the folded path is OFF on TPU.  XLA:TPU does not put channels in
the vector lanes for these activations — the compiled layout for
``bf16[128,512,512,16]`` intermediates is ``{0,3,2,1:T(8,128)(2,1)}``:
the BATCH dimension is minor and fills the 128 lanes, C rides the
sublanes, so the stock reduction is already layout-clean.  The flat
128-lane view fights that layout: XLA materializes an f32 copy of the
activation in the C-minor ``{3,2,1,0:T(8,128)}`` layout (8x lane
padding -> 16 GB for ONE decoder activation) before every reshape, and
the full step compile-OOMs at B=128 (26.01 G needed vs 15.75 G; control
with ``UDA_TPU_LANE_BN=0`` compiles and runs at 343.9 ms).  The same
copy sinks the plan-B Pallas kernels (they read the same flat view).
``lane='auto'`` therefore folds only on backends whose default layout
is row-major C-minor (CPU — where the numerics tests exercise the
path); TPU uses the flax-formula fallback, which XLA compiles to a
single fused convert+reduce pass with zero HLO temp at this shape.
``UDA_TPU_LANE_BN=force`` re-enables folding anywhere for measurement.

Numerics match flax exactly in formula (f32 stats, ``var = max(0,
E[x^2] - E[x]^2)``, f32 normalize, cast to ``dtype``); only the f32
reduction *order* differs (tested to 1e-5, ``tests/test_lane_bn.py``).
Shapes whose element count or channel count does not fold onto the
128-lane layout fall back to the flax formula under plain autodiff.

Running statistics are updated exactly like flax BatchNorm
(``momentum * ra + (1 - momentum) * batch``); gradients do not flow
into the running-stat outputs (they are consumed only by the mutable
``batch_stats`` collection, which train steps treat as aux).

Reference parity: replaces torch ``nn.BatchNorm2d`` layers used across
the reference models (e.g. reference ``src/models/train.py`` via
``smp.Unet``); behavioural contract unchanged.
"""

import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LANES = 128


def _foldable(x, c: int) -> bool:
    """True if per-channel sums over ``x`` can use the flat 128-lane view."""
    return (c <= x.size
            and (LANES % c == 0 or c % LANES == 0)
            and x.size % max(LANES, c) == 0)


def _fold_sums(arrs, c: int):
    """Per-channel sums of each (..., C) array via the flat 128-lane view.

    Multiple arrays are reduced in one traversal (XLA sibling-fuses
    reductions sharing their input pass).  Inputs are upcast to f32
    inside the reduction (the convert fuses; no f32 materialization).
    """
    lanes = max(LANES, c)
    outs = []
    for a in arrs:
        flat = a.astype(jnp.float32).reshape(-1, lanes)
        s = flat.sum(axis=0)
        if lanes != c:
            s = s.reshape(lanes // c, c).sum(axis=0)
        outs.append(s)
    return outs


def _fold(s, c: int):
    """(lanes,) per-lane sums -> (c,) per-channel sums."""
    return s if s.shape[0] == c else s.reshape(s.shape[0] // c, c).sum(axis=0)


def _pallas_ok(x, c: int) -> bool:
    from uda_aerial_semantic_segmentation_research_tpu.ops import (
        pallas_moments as pm,
    )
    lanes = max(LANES, c)
    m = x.size // lanes
    # compiled Mosaic only (interpret mode would silently serialize);
    # single chip only -- pallas_call is not SPMD-partitionable, so on
    # a mesh it would force an all-gather of the sharded activation
    # (the XLA reshape path partitions cleanly and stays default there)
    return (jax.default_backend() == "tpu" and jax.device_count() == 1
            and lanes == LANES and m % pm.BLOCK_M == 0)


def _stat_sums(x, c: int):
    """(sum, sumsq) per channel: XLA reshape path or plan-B Pallas kernel
    (``UDA_TPU_LANE_BN=pallas``; see ops/pallas_moments.py)."""
    if os.environ.get("UDA_TPU_LANE_BN") == "pallas" and _pallas_ok(x, c):
        from uda_aerial_semantic_segmentation_research_tpu.ops import (
            pallas_moments as pm,
        )
        s, q = pm.lane_sums(x.reshape(-1, LANES))
        return _fold(s, c), _fold(q, c)
    return _fold_sums((x, jax.lax.square(x.astype(jnp.float32))), c)


def _grad_sums(dy, x, c: int):
    """(sum dy, sum dy*x) per channel, same dispatch as ``_stat_sums``."""
    if os.environ.get("UDA_TPU_LANE_BN") == "pallas" and _pallas_ok(x, c):
        from uda_aerial_semantic_segmentation_research_tpu.ops import (
            pallas_moments as pm,
        )
        s, p = pm.lane_dual_sums(dy.reshape(-1, LANES), x.reshape(-1, LANES))
        return _fold(s, c), _fold(p, c)
    return _fold_sums((dy, dy.astype(jnp.float32) * x.astype(jnp.float32)), c)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _bn_train(eps: float, out_dtype, x, scale, bias):
    """Train-mode BN: returns ``(y, mean, var)`` with lane-folded stats.

    Statistics are computed from the RAW input upcast to f32 (flax
    contract); only the normalized output is cast to ``out_dtype``.
    The ``mean``/``var`` outputs exist for the running-statistics
    update only and are non-differentiable by contract (their
    cotangents are ignored in the backward rule).
    """
    y, mean, var, _ = _bn_train_impl(eps, out_dtype, x, scale, bias)
    return y, mean, var


def _bn_train_impl(eps, out_dtype, x, scale, bias):
    c = x.shape[-1]
    n = x.size // c
    s, q = _stat_sums(x, c)
    mean = s / n
    var = jnp.maximum(0.0, q / n - jax.lax.square(mean))
    inv = jax.lax.rsqrt(var + eps)
    mul = inv * scale
    y = ((x.astype(jnp.float32) - mean) * mul + bias).astype(out_dtype)
    return y, mean, var, inv


def _bn_train_fwd(eps, out_dtype, x, scale, bias):
    y, mean, var, inv = _bn_train_impl(eps, out_dtype, x, scale, bias)
    return (y, mean, var), (x, mean, inv, scale)


def _bn_train_bwd(eps, out_dtype, res, cts):
    dy, _dmean, _dvar = cts          # running-stat cotangents: see _bn_train
    x, mean, inv, scale = res
    c = x.shape[-1]
    n = x.size // c
    sd, sdx = _grad_sums(dy, x, c)
    # dscale = sum(dy * xhat), dbias = sum(dy)
    dscale = (sdx - mean * sd) * inv
    dbias = sd
    # dx = a*dy + cx*x + d  (per-channel FMA; classic BN input gradient
    # with the two sums substituted analytically)
    a = inv * scale
    cx = -a * jax.lax.square(inv) * (sdx - mean * sd) / n
    d = cx * (-mean) - a * sd / n
    dx = (a * dy.astype(jnp.float32) + cx * x.astype(jnp.float32)
          + d).astype(x.dtype)
    return dx, dscale, dbias


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class BatchNorm(nn.Module):
    """``nn.BatchNorm`` drop-in with lane-folded statistics (see module
    docstring).  Constructor surface matches the subset of BatchNorm
    used across this package; parameter and ``batch_stats`` trees are
    identical, so checkpoints interchange freely.  The class is NAMED
    ``BatchNorm`` so flax auto-naming of unnamed instances yields the
    same ``BatchNorm_N`` module paths as the flax original (checkpoint
    and pretrained-converter key parity).  ``LaneBN`` is an alias.

    ``lane='auto'`` uses the folded path whenever the activation shape
    permits on backends with row-major C-minor layouts (CPU); on TPU it
    resolves to the flax-formula fallback — see the module docstring's
    measured on-chip verdict.  ``False`` forces the fallback (plain
    autodiff) everywhere; ``UDA_TPU_LANE_BN=force`` the folded path.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros
    lane: Any = "auto"

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param("use_running_average",
                                self.use_running_average,
                                use_running_average)
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,),
                           self.param_dtype).astype(jnp.float32)
        bias = self.param("bias", self.bias_init, (c,),
                          self.param_dtype).astype(jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        if use_ra:
            mul = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x.astype(jnp.float32) - ra_mean.value) * mul + bias
            return y.astype(out_dtype)

        # Trace-time dispatch (see module docstring's measured verdict):
        #   auto  -> folded off TPU, flax-formula fallback on TPU (XLA:TPU
        #            lays batch into the lanes; the flat view forces an
        #            8x-padded f32 copy per activation and compile-OOMs)
        #   UDA_TPU_LANE_BN=0      -> fallback everywhere (A/B control)
        #   UDA_TPU_LANE_BN=force  -> folded everywhere (measurement)
        #   UDA_TPU_LANE_BN=pallas -> plan-B kernels where legal (_pallas_ok)
        env = os.environ.get("UDA_TPU_LANE_BN", "auto")
        lane = bool(self.lane) and env != "0" and (
            env in ("force", "pallas") or jax.default_backend() != "tpu")
        if lane and _foldable(x, c):
            y, mean, var = _bn_train(self.epsilon, out_dtype, x, scale, bias)
        else:
            x32 = x.astype(jnp.float32)
            # UDA_TPU_BN_BARRIER=1 (experiment knob, measured NON-WIN):
            # fence the statistics input so XLA cannot fuse the
            # convert+reduce into the producing conv's kOutput epilogue.
            # Tested whether the inline cross-lane f32 accumulation is
            # what holds those fusions at ~3x their bandwidth floor —
            # it is not: separating costs a full extra read of every
            # activation and LOSES 361.7 vs 321.6 ms/step at
            # B=128 @ 512px (r3s6, BASELINE.md).  Default off; identity
            # math either way (barrier is a scheduling fence).
            if os.environ.get("UDA_TPU_BN_BARRIER") == "1":
                s32 = jax.lax.optimization_barrier(x).astype(jnp.float32)
            else:
                s32 = x32
            axes = tuple(range(x.ndim - 1))
            mean = s32.mean(axes)
            var = jnp.maximum(0.0, jax.lax.square(s32).mean(axes)
                              - jax.lax.square(mean))
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            y = ((x32 - mean) * mul + bias).astype(out_dtype)

        # flax contract: write unconditionally outside init, so a train
        # step that forgot mutable=['batch_stats'] fails LOUD (flax
        # raises ModifyScopeVariableError) instead of silently training
        # with frozen running statistics
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value \
                + (1.0 - m) * jax.lax.stop_gradient(mean)
            ra_var.value = m * ra_var.value \
                + (1.0 - m) * jax.lax.stop_gradient(var)
        return y


LaneBN = BatchNorm

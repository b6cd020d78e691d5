"""Microbench: decoder-shape conv / BN-stats / conv+BN cost isolation.

Shapes: the block4 conv2 (16ch @ 512px, B=128) that the step profile
attributes ~7 ms/instance to (convert_reduce fusions, BASELINE.md r3).
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from functools import partial

B, H, W, C = 128, 512, 512, 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32)).astype(jnp.bfloat16)
scale = jnp.ones((C,), jnp.float32)
bias = jnp.zeros((C,), jnp.float32)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@jax.jit
def f_conv(x, k):
    return conv(x, k)


@jax.jit
def f_stats(x):
    x32 = x.astype(jnp.float32)
    mean = x32.mean((0, 1, 2))
    var = jnp.maximum(0.0, jax.lax.square(x32).mean((0, 1, 2))
                      - jax.lax.square(mean))
    return mean, var


@jax.jit
def f_conv_bn_relu(x, k, scale, bias):
    y = conv(x, k)
    y32 = y.astype(jnp.float32)
    mean = y32.mean((0, 1, 2))
    var = jnp.maximum(0.0, jax.lax.square(y32).mean((0, 1, 2))
                      - jax.lax.square(mean))
    mul = jax.lax.rsqrt(var + 1e-5) * scale
    out = jnp.maximum((y32 - mean) * mul + bias, 0.0).astype(jnp.bfloat16)
    return out, mean, var


@jax.jit
def f_copy(x):
    return x + jnp.bfloat16(1.0)


def bench(name, fn, *args):
    # feed the (jittered) output back as the input so no two iterations
    # see identical buffers -- the remote runtime memoizes repeat
    # executions of the same (executable, args), which zeroed out the
    # first version of this benchmark
    r = fn(*args)
    jax.block_until_ready(r)
    x0 = args[0]
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        r = fn(x0, *args[1:])
        x0 = jax.tree.leaves(r)[0].reshape(x0.shape) if \
            jax.tree.leaves(r)[0].size == x0.size else x0 + jnp.bfloat16(1e-3)
    jax.block_until_ready(x0)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:18s} {dt:7.3f} ms", flush=True)
    return dt


bench("copy(x+1)", f_copy, x)           # pure BW floor: 2.14 GB traffic
bench("conv3x3", f_conv, x, k)          # 154 GFLOP + 2.14 GB
bench("stats", f_stats, x)              # 1.07 GB read
bench("conv+bn+relu", f_conv_bn_relu, x, k, scale, bias)

# larger-channel control: same bytes, 64ch @ 256px
B2, H2, W2, C2 = 128, 256, 256, 64
x2 = jnp.asarray(rng.standard_normal((B2, H2, W2, C2)).astype(np.float32)).astype(jnp.bfloat16)
k2 = jnp.asarray(rng.standard_normal((3, 3, C2, C2)).astype(np.float32)).astype(jnp.bfloat16)
f_conv2 = jax.jit(lambda x, k: conv(x, k))
bench("conv3x3 64ch/256", f_conv2, x2, k2)   # 617 GFLOP + 2.14 GB

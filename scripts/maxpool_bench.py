"""Max-pool 3D A/B: reduce_window vs tap-stack vs Pallas argmax kernel.

BENCH.md's ResNet step composition attributes ~29 ms (b64 trace) to the
max-pool BACKWARD — XLA derives reduce_window's gradient as
select-and-scatter, a windowed scan with poor TPU lowering. The same
function is expressible as a max over the 27 strided tap slices of the
padded input; its autodiff backward is an equality mask + 27 fused
dilated adds — no select-and-scatter anywhere.

Semantics note: on ties inside a window, select-and-scatter (and torch)
route the gradient to ONE winner; the tap-stack backward splits it among
tied taps. Real activations (post conv+BN) tie with probability ~0, and
the forward values are bit-identical either way.

Usage: python scripts/maxpool_bench.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from neurovit_tpu.models.resnet3d import max_pool3d, max_pool3d_taps
from neurovit_tpu.ops.maxpool3d import max_pool3d_pallas


def max_pool3d_separable(x, ksize=3, stride=2, padding=1):
    """3D max-pool as three nested 1-D pools (identical forward values)."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    out = x
    for axis in (1, 2, 3):
        dims, strides, pads = [1] * 5, [1] * 5, [(0, 0)] * 5
        dims[axis], strides[axis], pads[axis] = ksize, stride, (padding, padding)
        out = jax.lax.reduce_window(out, neg, jax.lax.max,
                                    window_dimensions=dims,
                                    window_strides=strides, padding=pads)
    return out


def timeit(fn, *args, iters=5):
    # fn returns a SCALAR: fetching it each iter is the only hard sync the
    # remote TPU platform honors (block_until_ready can return early —
    # CLAUDE.md gotcha), and a scalar keeps the tunnel transfer negligible.
    _ = float(fn(*args))                        # compile + warm
    t0 = time.time()
    for _ in range(iters):
        _ = float(fn(*args))
    return (time.time() - t0) / iters * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # ResNet-3D stem output shape at 90^3 input (resnet_3d.py:116-124):
    # conv stride (1,2,2) -> [B, 90, 45, 45, 64] for the default conv1_t.
    x = jax.random.normal(jax.random.key(0), (batch, 90, 45, 45, 64),
                          jnp.bfloat16)

    for name, pool in (("reduce_window", max_pool3d),
                       ("separable", max_pool3d_separable),
                       ("tap-stack", max_pool3d_taps),
                       ("pallas-argmax", max_pool3d_pallas)):
        fwd = jax.jit(lambda v, pool=pool: jnp.sum(pool(v).astype(jnp.float32)))

        def loss(v, pool=pool):
            return jnp.sum(pool(v).astype(jnp.float32))

        grad = jax.jit(lambda v, loss=loss: jnp.sum(
            jax.grad(loss)(v).astype(jnp.float32)))
        t_f = timeit(fwd, x)
        t_b = timeit(grad, x)
        print(f"{name:14s} fwd {t_f:7.2f} ms   grad(fwd) {t_b:7.2f} ms", flush=True)

    # numerics: forwards identical
    a = jax.jit(max_pool3d)(x)
    b = jax.jit(max_pool3d_taps)(x)
    c = jax.jit(max_pool3d_pallas)(x)
    print("fwd allclose: taps", bool(jnp.all(a == b)),
          "pallas", bool(jnp.all(a == c)))


if __name__ == "__main__":
    main()

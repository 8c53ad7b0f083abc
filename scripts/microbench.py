"""Component microbenchmarks on TPU: where the forward's ms live."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, N, D = 32, 1001, 1024
INNER, MLP = 512, 2048


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.randn(D, 3 * INNER), jnp.bfloat16) * 0.02
    w_out = jnp.asarray(rng.randn(INNER, D), jnp.bfloat16) * 0.02
    w1 = jnp.asarray(rng.randn(D, MLP), jnp.bfloat16) * 0.02
    w2 = jnp.asarray(rng.randn(MLP, D), jnp.bfloat16) * 0.02

    @jax.jit
    def block_matmuls(x):
        # 6 blocks of qkv+out+fc1+fc2 (no LN/attn/residual)
        def one(h, _):
            qkv = jnp.dot(h, w_qkv, preferred_element_type=jnp.float32)
            o = jnp.dot(qkv[..., :INNER].astype(jnp.bfloat16), w_out,
                        preferred_element_type=jnp.float32)
            h = (h + o.astype(jnp.bfloat16))
            m = jnp.dot(h, w1, preferred_element_type=jnp.float32)
            m = jax.nn.gelu(m).astype(jnp.bfloat16)
            h = h + jnp.dot(m, w2,
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return h, None
        h, _ = jax.lax.scan(one, x, None, length=6)
        return h

    t = timeit(block_matmuls, x)
    flops = 6 * B * N * 2 * (D * 3 * INNER + INNER * D + D * MLP + MLP * D)
    print(f"matmul-chain     : {t*1e3:6.1f}ms  {flops/t/1e12:6.1f} TF/s")

    scale = jnp.ones(D, jnp.float32)
    bias = jnp.zeros(D, jnp.float32)

    @jax.jit
    def ln_stack(x):
        def one(h, _):
            hf = h.astype(jnp.float32)
            mu = hf.mean(-1, keepdims=True)
            var = ((hf - mu) ** 2).mean(-1, keepdims=True)
            out = (hf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            return out.astype(jnp.bfloat16), None
        h, _ = jax.lax.scan(one, x, None, length=13)
        return h

    t = timeit(ln_stack, x)
    print(f"13x layernorm    : {t*1e3:6.1f}ms")

    from neurovit_tpu.ops.flash_attention import flash_attention
    q = jnp.asarray(rng.randn(B, 8, N, 64), jnp.bfloat16)

    @jax.jit
    def attn6(q):
        def one(h, _):
            return flash_attention(h, h, h, scale=0.125), None
        h, _ = jax.lax.scan(one, q, None, length=6)
        return h

    t = timeit(attn6, q)
    aflops = 6 * 4 * B * 8 * N * N * 64
    print(f"6x flash attn    : {t*1e3:6.1f}ms  {aflops/t/1e12:6.1f} TF/s")

    vol = jnp.asarray(rng.randn(B, 1, 90, 90, 90), jnp.bfloat16)

    @jax.jit
    def patchify_only(v):
        from neurovit_tpu.models.vit3d import patchify, ViTConfig
        cfg = ViTConfig(image_size=90, image_patch_size=9, frames=90,
                        frame_patch_size=9, num_classes=2)
        return patchify(v, cfg)

    t = timeit(patchify_only, vol)
    print(f"patchify         : {t*1e3:6.1f}ms")

    wp = jnp.asarray(rng.randn(729, 1024), jnp.bfloat16) * 0.02
    patches = patchify_only(vol)

    @jax.jit
    def patch_proj(p):
        return jnp.dot(p, wp, preferred_element_type=jnp.float32)

    t = timeit(patch_proj, patches)
    print(f"patch proj       : {t*1e3:6.1f}ms")

    # dropout mask cost comparison: threefry vs rbg
    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        key = jax.random.key(0, impl=impl)

        @jax.jit
        def masks(key):
            ks = jax.random.split(key, 12)
            outs = []
            for i in range(12):
                outs.append(jax.random.bernoulli(ks[i], 0.9, (B, N, MLP)))
            return outs

        t = timeit(masks, key, iters=5)
        print(f"12x dropout mask [{impl:12s}]: {t*1e3:6.1f}ms")


if __name__ == "__main__":
    print(jax.devices())
    main()

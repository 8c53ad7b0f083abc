"""TPU-chip validation: pallas kernel numerics + flagship train-step timing.

Run on a machine with a real TPU (the CPU test suite covers interpret-mode
numerics; this validates the compiled Mosaic kernels):

    python scripts/tpu_smoke.py [--quick]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def check_kernel_numerics():
    from neurovit_tpu.ops.attention import _sdpa_xla
    from neurovit_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    for (b, h, n, d) in [(2, 8, 1001, 64), (2, 2, 140, 32)]:
        q, k, v = [jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
                   for _ in range(3)]
        scale = d ** -0.5
        ours = flash_attention(q, k, v, scale=scale)
        gold = _sdpa_xla(q, k, v, scale=scale, dropout_rate=0.0,
                         dropout_rng=None, deterministic=True)
        err = float(jnp.max(jnp.abs(ours.astype(jnp.float32)
                                    - gold.astype(jnp.float32))))
        print(f"fwd  ({b},{h},{n},{d}) max|err| = {err:.2e}")
        assert err < 2e-2, "forward mismatch"

        def loss_f(fn):
            def inner(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            return inner

        g_ours = jax.grad(loss_f(lambda *a: flash_attention(
            *a, scale=scale)), argnums=(0, 1, 2))(q, k, v)
        g_gold = jax.grad(loss_f(lambda *a: _sdpa_xla(
            *a, scale=scale, dropout_rate=0.0, dropout_rng=None,
            deterministic=True)), argnums=(0, 1, 2))(q, k, v)
        for go, gg, name in zip(g_ours, g_gold, "qkv"):
            rel = float(jnp.max(jnp.abs(go.astype(jnp.float32)
                                        - gg.astype(jnp.float32)))
                        / (jnp.max(jnp.abs(gg.astype(jnp.float32))) + 1e-6))
            print(f"bwd d{name} ({b},{h},{n},{d}) rel err = {rel:.2e}")
            assert rel < 5e-2, f"backward d{name} mismatch"

    # In-kernel dropout: deterministic given rng, ~unbiased.
    q, k, v = [jnp.asarray(rng.randn(1, 4, 256, 64), jnp.float32)
               for _ in range(3)]
    key = jax.random.key(3)
    o1 = flash_attention(q, k, v, scale=0.125, dropout_rate=0.3,
                         dropout_rng=key)
    o2 = flash_attention(q, k, v, scale=0.125, dropout_rate=0.3,
                         dropout_rng=key)
    assert bool(jnp.all(o1 == o2)), "dropout not deterministic under same rng"
    o3 = flash_attention(q, k, v, scale=0.125, dropout_rate=0.3,
                         dropout_rng=jax.random.key(4))
    assert not bool(jnp.all(o1 == o3)), "dropout ignored rng"
    print("dropout determinism OK")


def check_maxpool_kernel():
    """Compiled Mosaic maxpool fwd values + backward vs XLA autodiff
    (tie-free input, so single-winner == equal-split)."""
    from neurovit_tpu.models.resnet3d import max_pool3d
    from neurovit_tpu.ops.maxpool3d import max_pool3d_pallas

    rng = np.random.RandomState(7)
    shape = (2, 10, 9, 11, 64)
    n = int(np.prod(shape))
    x = jnp.asarray(rng.permutation(n).reshape(shape) / n, jnp.float32)
    g = jnp.asarray(rng.randn(*max_pool3d(x).shape), jnp.float32)

    @jax.jit
    def both(v):
        ref = jax.grad(lambda a: jnp.vdot(max_pool3d(a), g))(v)
        new = jax.grad(lambda a: jnp.vdot(max_pool3d_pallas(a), g))(v)
        return (jnp.max(jnp.abs(max_pool3d(v) - max_pool3d_pallas(v))),
                jnp.max(jnp.abs(ref - new)))

    f_err, b_err = (float(e) for e in both(x))
    print(f"maxpool pallas fwd max|err| = {f_err:.2e}, "
          f"bwd max|err| = {b_err:.2e}")
    assert f_err == 0.0 and b_err < 1e-6, "maxpool kernel mismatch"


def check_int8_serving():
    """int8 serving kernels (LN+rowquant+int8 MXU+dequant) vs the f32
    composition — the per-row/per-col symmetric scheme should sit at ~1-2%
    relative error on N(0,1) activations."""
    from neurovit_tpu import nn
    from neurovit_tpu.models import vit3d
    from neurovit_tpu.ops import int8_serving

    cfg = vit3d.ViTConfig(image_size=18, image_patch_size=9, frames=18,
                          frame_patch_size=9, num_classes=2, dim=256,
                          depth=1, heads=4, dim_head=64, mlp_dim=512)
    blk = jax.tree.map(lambda p: p[0],
                       vit3d.init(jax.random.key(9), cfg)["blocks"])
    qblk = int8_serving.quantize_blocks(blk)
    x = jnp.asarray(np.random.RandomState(9).randn(4, 512, 256), jnp.bfloat16)

    @jax.jit
    def errs(x):
        q8, k8, v8 = int8_serving.int8_ln_qkv(qblk, x, cfg.heads,
                                              cfg.dim_head)
        u = nn.layer_norm(blk["attn_norm"], x.astype(jnp.float32))
        w = blk["qkv"]["kernel"].reshape(cfg.dim, 3, cfg.heads, cfg.dim_head)
        rq = jnp.einsum("bnd,dhe->bnhe", u, w[:, 0])
        y8 = int8_serving.int8_mlp_block(qblk, x)
        h = nn.gelu(nn.linear(blk["fc1"],
                              nn.layer_norm(blk["mlp_norm"],
                                            x.astype(jnp.float32))))
        ry = x.astype(jnp.float32) + nn.linear(blk["fc2"], h)

        def rel(a, b):
            return jnp.linalg.norm(a.astype(jnp.float32) - b) \
                / jnp.linalg.norm(b)

        # round 4: PV-int8 attention vs the exact f32 softmax composition
        scale = cfg.dim_head ** -0.5
        a8 = int8_serving.int8_flash_attention(q8, k8, v8, scale=scale)
        qf, kf, vf = (t.astype(jnp.float32) for t in (q8, k8, v8))
        s = jnp.einsum("bnhd,bmhd->bhnm", qf, kf) * scale
        ra = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, axis=-1), vf)
        return rel(q8, rq), rel(y8, ry), rel(a8, ra)

    e_q, e_m, e_a = (float(e) for e in errs(x))
    print(f"int8 serving rel err: qkv {e_q:.4f}, mlp {e_m:.4f}, "
          f"attn-pv {e_a:.4f}")
    assert e_q < 0.05 and e_m < 0.05 and e_a < 0.02, \
        "int8 serving kernels off"


def check_fused_dropout():
    from neurovit_tpu.ops import dropout as fused

    x = jnp.asarray(np.random.RandomState(5).randn(64, 1001, 256), jnp.bfloat16)
    key = jax.random.key(11)
    y1 = fused.dropout(key, x, 0.1)
    y2 = fused.dropout(key, x, 0.1)
    assert bool(jnp.all(y1 == y2)), "fused dropout not deterministic"
    kept = float(jnp.mean((y1 != 0).astype(jnp.float32)))
    assert 0.88 < kept < 0.92, f"keep fraction off: {kept}"
    # Unbiased: E[y] == x, so E|y| == E|x| for inverted dropout.
    ratio = float(jnp.mean(jnp.abs(y1.astype(jnp.float32)))
                  / jnp.mean(jnp.abs(x.astype(jnp.float32))))
    assert 0.9 < ratio < 1.1, f"dropout biased: {ratio}"

    def loss(x):
        return jnp.sum(fused.dropout(key, x, 0.3).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss)(x)
    g2 = jax.grad(loss)(x)
    assert bool(jnp.all(g1 == g2)), "fused dropout bwd mask mismatch"
    # grad zero exactly where fwd dropped
    y3 = fused.dropout(key, x, 0.3)
    assert bool(jnp.all((jnp.abs(g1) > 0) == (y3 != 0))), \
        "bwd mask differs from fwd mask"
    print("fused dropout kernel OK")


def check_fused_mlp():
    """Compiled fused MLP block vs the XLA golden composition on-chip."""
    from neurovit_tpu import nn
    from neurovit_tpu.ops import fused_mlp

    rng = np.random.RandomState(9)
    dim, hid = 1024, 2048
    k1, k2 = jax.random.split(jax.random.key(7))
    params = {
        "mlp_norm": nn.layer_norm_init(dim),
        "fc1": nn.linear_init(k1, dim, hid),
        "fc2": nn.linear_init(k2, hid, dim),
    }
    x = jnp.asarray(rng.randn(2, 1024, dim), jnp.bfloat16)

    def golden(p, v):
        h = nn.layer_norm(p["mlp_norm"], v)
        h = nn.gelu(nn.linear(p["fc1"], h))
        return nn.linear(p["fc2"], h) + v

    got = fused_mlp.fused_mlp_block(params, x)
    want = golden(params, x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"fused_mlp fwd max|err| = {err:.2e} (scale {scale:.1f})")
    assert err < 0.15, "fused MLP forward mismatch"

    cot = jnp.asarray(rng.randn(2, 1024, dim), jnp.float32)
    g_ours = jax.grad(lambda p, v: jnp.sum(
        fused_mlp.fused_mlp_block(p, v).astype(jnp.float32) * cot),
        argnums=(0, 1))(params, x)
    g_gold = jax.grad(lambda p, v: jnp.sum(
        golden(p, v).astype(jnp.float32) * cot), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ours), jax.tree.leaves(g_gold)):
        rel = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-6))
        assert rel < 5e-2, f"fused MLP grad mismatch rel={rel}"
    print("fused_mlp grads OK")

    # In-kernel dropout: deterministic given rng, correct keep fraction.
    key = jax.random.key(13)
    y1 = fused_mlp.fused_mlp_block(params, x, dropout_rate=0.5, rng=key,
                                   deterministic=False)
    y2 = fused_mlp.fused_mlp_block(params, x, dropout_rate=0.5, rng=key,
                                   deterministic=False)
    assert bool(jnp.all(y1 == y2)), "fused MLP dropout not deterministic"
    # The final dropout zeroes the MLP branch -> y == x there: ~50% of
    # entries equal the residual input exactly.
    frac = float(jnp.mean((y1 == x).astype(jnp.float32)))
    assert 0.45 < frac < 0.55, f"dropout keep fraction off: {frac}"
    print(f"fused_mlp dropout OK (residual-only fraction {frac:.3f})")


def check_fused_attention_path():
    """Compiled fused LN+QKV, bnhd flash, and outproj kernels vs the XLA
    composition, on-chip, deterministic."""
    from neurovit_tpu import nn
    from neurovit_tpu.models import vit3d
    from neurovit_tpu.ops import fused_outproj, fused_qkv
    from neurovit_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(11)
    dim, heads, dim_head = 1024, 8, 64
    inner = heads * dim_head
    cfg = vit3d.ViTConfig(image_size=90, image_patch_size=9, frames=90,
                          frame_patch_size=9, num_classes=2, impl="pallas")
    key = jax.random.key(21)
    params = vit3d.init(key, cfg)
    block = jax.tree.map(lambda p: p[0].astype(jnp.float32),
                         params["blocks"])
    x = jnp.asarray(rng.randn(2, 1024, dim), jnp.bfloat16)

    def golden(block, x):
        normed = nn.layer_norm(block["attn_norm"], x)
        w = block["qkv"]["kernel"].astype(x.dtype).reshape(
            dim, 3, heads, dim_head)
        q, k, v = (jnp.einsum("bnd,dhe->bhne", normed, w[:, i],
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype) for i in range(3))
        out = flash_attention(q, k, v, scale=dim_head ** -0.5)
        wout = block["attn_out"]["kernel"].astype(out.dtype).reshape(
            heads, dim_head, dim)
        proj = jnp.einsum("bhne,hed->bnd", out, wout,
                          preferred_element_type=jnp.float32)
        return x + (proj + block["attn_out"]["bias"].astype(jnp.float32)
                    ).astype(x.dtype)

    def fused(block, x):
        q, k, v = fused_qkv.fused_ln_qkv(block, x, heads, dim_head)
        out = flash_attention(q, k, v, scale=dim_head ** -0.5,
                              layout="bnhd")
        return fused_outproj.fused_outproj_residual(
            block["attn_out"], x, out.reshape(2, 1024, inner),
            deterministic=True)

    got, want = fused(block, x), golden(block, x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"fused attn path fwd max|err| = {err:.2e} (scale {scale:.1f})")
    assert err < 0.15, "fused attention path forward mismatch"

    cot = jnp.asarray(rng.randn(2, 1024, dim), jnp.float32)
    g_f = jax.grad(lambda b, v: jnp.sum(
        fused(b, v).astype(jnp.float32) * cot), argnums=(0, 1))(block, x)
    g_g = jax.grad(lambda b, v: jnp.sum(
        golden(b, v).astype(jnp.float32) * cot), argnums=(0, 1))(block, x)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_g)):
        denom = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
        rel = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))) / denom
        assert rel < 5e-2, f"fused attention path grad mismatch rel={rel}"
    print("fused attn path grads OK")


def time_flagship(impl: str, batch: int = 32, iters: int = 10):
    import optax
    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    config = load_config(overrides={
        "DATASET_NAME": "gradcam", "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9, "GRADCAM_CUBE_SIZE": 8,
        "TRAINING_DROPOUT": 0.1, "TRAINING_PRECISION": "bf16",
        "KERNEL_IMPL": impl})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params = variables["params"]
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 90, 90, 90),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, batch))
    rng = jax.random.key(1)

    @jax.jit
    def step(params, opt_state, rng):
        rng, srng = jax.random.split(rng)

        def loss_fn(p):
            logits, _ = model.apply(p, x, deterministic=False, rng=srng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    t0 = time.perf_counter()
    params, opt_state, rng, loss = step(params, opt_state, rng)
    jax.block_until_ready(loss)
    print(f"[{impl}] compile+first step: {time.perf_counter()-t0:.1f}s")
    for _ in range(2):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    vps = batch * iters / dt
    print(f"[{impl}] {vps:.1f} volumes/sec/chip "
          f"({dt/iters*1000:.1f} ms/step, batch {batch}, "
          f"loss {float(loss):.4f})")
    return vps


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    check_kernel_numerics()
    check_fused_dropout()
    check_fused_mlp()
    check_fused_attention_path()
    check_maxpool_kernel()
    check_int8_serving()
    if not args.quick:
        def try_time(impl, batch):
            while batch >= 2:
                try:
                    return time_flagship(impl, batch=batch), batch
                except Exception as e:  # XLA path OOMs at large batch
                    print(f"[{impl}] batch {batch} failed "
                          f"({type(e).__name__}); halving")
                    batch //= 2
            raise RuntimeError(f"{impl} failed at all batch sizes")

        pallas_vps, pb = try_time("pallas", args.batch)
        xla_vps, xb = try_time("xla", args.batch)
        print(f"pallas {pallas_vps:.1f} v/s (batch {pb}) vs "
              f"xla {xla_vps:.1f} v/s (batch {xb}): "
              f"{pallas_vps/xla_vps:.2f}x")

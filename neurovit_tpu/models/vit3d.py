"""3D Vision Transformer, pure-functional JAX.

Re-implements the semantics of the reference's vit-pytorch-style 3D ViT
(``src/models/vit_3d.py``) as a TPU-first design:

- patchify via reshape/transpose matching the einops pattern
  ``'b c (f pf) (h p1) (w p2) -> b (f h w) (p1 p2 pf c)'`` (vit_3d.py:92),
- LayerNorm -> Linear(patch_dim, dim) -> LayerNorm patch embedding
  (vit_3d.py:91-96),
- standard-normal pos-embedding over num_patches+1 tokens and CLS token
  (vit_3d.py:98-99),
- ``depth`` pre-norm blocks of MHSA + MLP with residuals (vit_3d.py:62-75),
  executed with ``lax.scan`` over stacked block parameters (compile-time
  O(1) in depth; optionally rematerialized),
- fused-qkv attention with no bias (vit_3d.py:41), per-head dim ``dim_head``,
  softmax scale ``dim_head**-0.5``, attention-prob + output dropout,
- exact-erf GELU MLP (vit_3d.py:14-26),
- 'cls' or 'mean' pooling + LayerNorm + Linear head (vit_3d.py:104-110).

The attention core dispatches to a Pallas flash-attention kernel on TPU
(``ops/attention.py``). A Grad-CAM "probe" replaces the reference's
forward/backward hooks on the last block's attention LayerNorm
(``NeuroEncoder.py:70-82``): the probe adds a zeros tensor at that exact
activation so its gradient/value are available through ``jax.vjp`` without
any hook machinery (jit-clean).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from neurovit_tpu import nn
from neurovit_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int            # H == W (reference passes the same grid, NeuroEncoder.py:183)
    image_patch_size: int
    frames: int                # depth axis ("frames" in the 3D ViT)
    frame_patch_size: int
    num_classes: int
    dim: int = 1024
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 2048
    channels: int = 1
    pool: str = "cls"          # 'cls' or 'mean' (vit_3d.py:89,123)
    dropout: float = 0.0
    emb_dropout: float = 0.0
    impl: str = "xla"          # attention impl: "xla" | "pallas"
    remat: bool = False        # jax.checkpoint each block
    # Patch embedding lowering: "gather" reshapes/transposes patches then
    # LN+Linear (reference semantics, vit_3d.py:91-96); "conv" computes the
    # SAME function as strided 3D convolutions (no 8-D transpose — ~5 ms/step
    # cheaper on TPU); "auto" = conv on TPU, gather elsewhere.
    patch_embed: str = "auto"
    # GPipe pipeline parallelism over the block stack (parallel/pipeline.py):
    # >1 runs the blocks sharded over the mesh's `pipe` axis. Requires
    # depth % pipeline_stages == 0 and an ambient mesh with that axis.
    pipeline_stages: int = 1
    pp_microbatches: int = 0   # 0 = auto (2 * stages, halved to divide B)
    # int8-serving attention PV path: "pv" runs PV on the int8 MXU
    # (+measured win, BENCH.md "int8 go/no-go"), "off" keeps the bf16 flash
    # kernel (A/B). Static model config — BOUND AT COMPILE TIME like every
    # numerics-changing switch (config key SERVING_INT8_ATTN; the
    # NEUROVIT_INT8_ATTN env var is only read once at model construction).
    int8_attn: str = "pv"

    def __post_init__(self):
        assert self.image_size % self.image_patch_size == 0, \
            "Image dimensions must be divisible by the patch size."
        assert self.frames % self.frame_patch_size == 0, \
            "Frames must be divisible by frame patch size"
        assert self.pool in ("cls", "mean")

    @property
    def grid(self) -> Tuple[int, int, int]:
        return (self.frames // self.frame_patch_size,
                self.image_size // self.image_patch_size,
                self.image_size // self.image_patch_size)

    @property
    def num_patches(self) -> int:
        f, h, w = self.grid
        return f * h * w

    @property
    def patch_dim(self) -> int:
        return (self.channels * self.image_patch_size ** 2 * self.frame_patch_size)

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head

    @property
    def project_out(self) -> bool:
        # vit_3d.py:32 — identity out-proj iff single full-width head.
        return not (self.heads == 1 and self.dim_head == self.dim)


def init(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    """Initialize the ViT parameter pytree (PyTorch-matched distributions)."""
    keys = jax.random.split(key, 6 + cfg.depth)
    k_proj, k_pos, k_cls, k_head = keys[:4]
    params = {
        "patch_embed": {
            "norm_pre": nn.layer_norm_init(cfg.patch_dim, dtype),
            "proj": nn.linear_init(k_proj, cfg.patch_dim, cfg.dim, dtype=dtype),
            "norm_post": nn.layer_norm_init(cfg.dim, dtype),
        },
        # randn init, matching vit_3d.py:98-99.
        "pos_embedding": jax.random.normal(k_pos, (1, cfg.num_patches + 1, cfg.dim), dtype),
        "cls_token": jax.random.normal(k_cls, (1, 1, cfg.dim), dtype),
        "blocks": _init_blocks(keys[4:4 + cfg.depth], cfg, dtype),
        "head": {
            "norm": nn.layer_norm_init(cfg.dim, dtype),
            "fc": nn.linear_init(k_head, cfg.dim, cfg.num_classes, dtype=dtype),
        },
    }
    return params


def _init_block(key: jax.Array, cfg: ViTConfig, dtype) -> dict:
    k_qkv, k_out, k_fc1, k_fc2 = jax.random.split(key, 4)
    block = {
        "attn_norm": nn.layer_norm_init(cfg.dim, dtype),
        "qkv": nn.linear_init(k_qkv, cfg.dim, cfg.inner_dim * 3,
                              use_bias=False, dtype=dtype),
        "mlp_norm": nn.layer_norm_init(cfg.dim, dtype),
        "fc1": nn.linear_init(k_fc1, cfg.dim, cfg.mlp_dim, dtype=dtype),
        "fc2": nn.linear_init(k_fc2, cfg.mlp_dim, cfg.dim, dtype=dtype),
    }
    if cfg.project_out:
        block["attn_out"] = nn.linear_init(k_out, cfg.inner_dim, cfg.dim, dtype=dtype)
    return block


def _init_blocks(keys, cfg: ViTConfig, dtype) -> dict:
    """Stack per-block params along a leading depth axis (lax.scan layout)."""
    blocks = [_init_block(k, cfg, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def unstack_blocks(blocks: dict, depth: int) -> list:
    """Inverse of the stacked layout — used for torch-key export."""
    return [jax.tree.map(lambda x, i=i: x[i], blocks) for i in range(depth)]


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def patchify(volume: jax.Array, cfg: ViTConfig) -> jax.Array:
    """[B, C, F, H, W] -> [B, (f h w), (p1 p2 pf c)].

    Pure reshape/transpose; matches the einops pattern at vit_3d.py:92
    including the (p1 p2 pf c) ordering inside each patch vector, so
    patch-embedding weights are interchangeable with the reference.
    """
    b = volume.shape[0]
    f, h, w = cfg.grid
    pf, p = cfg.frame_patch_size, cfg.image_patch_size
    c = cfg.channels
    x = volume.reshape(b, c, f, pf, h, p, w, p)
    #                 b  c  f  pf h  p1 w  p2 -> b f h w p1 p2 pf c
    x = x.transpose(0, 2, 4, 6, 5, 7, 3, 1)
    return x.reshape(b, f * h * w, p * p * pf * c)


def _patch_embed_gather(pe: dict, volume: jax.Array, cfg: ViTConfig
                        ) -> jax.Array:
    """Reference lowering: patchify -> LN -> Linear -> LN."""
    x = patchify(volume, cfg)
    x = nn.layer_norm(pe["norm_pre"], x)
    x = nn.linear(pe["proj"], x)
    return nn.layer_norm(pe["norm_post"], x)


def _patch_embed_conv(pe: dict, volume: jax.Array, cfg: ViTConfig
                      ) -> jax.Array:
    """Conv lowering of LN(patch) @ W + b — bit-for-bit the same function.

    LN(p)@W = (1/sigma)[(p . gamma)@W - mu (gamma@W)] + beta@W + b, so the
    projection becomes one strided conv3d with kernel gamma.W, plus two cheap
    average convs for mu and sigma. Avoids materializing the [B, 1000, 729]
    patch tensor and its 8-D transpose entirely; XLA lowers the convs onto
    the MXU directly from the volume layout.
    """
    p, pf, c = cfg.image_patch_size, cfg.frame_patch_size, cfg.channels
    dim = cfg.dim
    patch_dim = cfg.patch_dim
    gamma = pe["norm_pre"]["scale"].astype(jnp.float32)
    beta = pe["norm_pre"]["bias"].astype(jnp.float32)
    w = pe["proj"]["kernel"].astype(jnp.float32)          # [patch_dim, dim]
    b = pe["proj"]["bias"].astype(jnp.float32)

    # Patch-vector index order is (p1, p2, pf, c) (vit_3d.py:92); conv kernel
    # wants [pf, p1, p2, c, out] (DHWIO — channels-last is the TPU-native
    # conv layout, and the NDHWC output reshapes straight into the token
    # stream with no transpose).
    def to_conv_kernel(vec_w):
        k = vec_w.reshape(p, p, pf, c, dim)               # (p1, p2, pf, c, k)
        return k.transpose(2, 0, 1, 3, 4)                 # [pf, p1, p2, c, k]

    compute_dtype = volume.dtype
    x = volume.transpose(0, 2, 3, 4, 1)                   # [B, D, H, W, C]
    strides = (pf, p, p)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def conv(inp, kernel):
        # Uniform operand dtypes (mixed-dtype conv breaks the VJP transpose
        # rule); the TPU MXU accumulates in f32 internally either way.
        return jax.lax.conv_general_dilated(
            inp, kernel.astype(inp.dtype), window_strides=strides,
            padding="VALID", dimension_numbers=dn,
            precision=nn.matmul_precision(inp.dtype))

    t1 = conv(x, to_conv_kernel(w * gamma[:, None])).astype(jnp.float32)
    ones = jnp.ones((pf, p, p, c, 1), jnp.float32)
    xf = x.astype(jnp.float32)
    mu = conv(xf, ones) / patch_dim                       # [B, f, h, w, 1]
    musq = conv(xf ** 2, ones) / patch_dim
    var = musq - mu ** 2
    inv_sigma = jax.lax.rsqrt(var + nn.LN_EPS)

    s = (gamma @ w)[None, None, None, None, :]            # [1, 1, 1, 1, dim]
    c0 = (beta @ w + b)[None, None, None, None, :]
    out = (t1 - mu * s) * inv_sigma + c0                  # [B, f, h, w, dim]

    bsz = out.shape[0]
    tokens = out.reshape(bsz, -1, dim)                    # [B, (f h w), dim]
    tokens = tokens.astype(compute_dtype)
    return nn.layer_norm(pe["norm_post"], tokens)


def _patch_embed(pe: dict, volume: jax.Array, cfg: ViTConfig) -> jax.Array:
    mode = cfg.patch_embed
    if mode == "auto":
        mode = "conv" if jax.default_backend() == "tpu" else "gather"
    if mode == "conv":
        return _patch_embed_conv(pe, volume, cfg)
    return _patch_embed_gather(pe, volume, cfg)


def _attention(block: dict, x: jax.Array, cfg: ViTConfig, *,
               deterministic: bool, rng: Optional[jax.Array],
               probe_shift: Optional[jax.Array] = None,
               n_valid: Optional[int] = None):
    """Pre-norm MHSA. Returns (residual_branch_output, ln_activation)."""
    normed = nn.layer_norm(block["attn_norm"], x)
    if probe_shift is not None:
        # Grad-CAM capture point == reference hook target
        # transformer.layers[-1][0].norm (NeuroEncoder.py:72).
        normed = normed + probe_shift.astype(normed.dtype)
    ln_act = normed
    b, n, _ = normed.shape
    prec = nn.matmul_precision(normed.dtype)
    # qkv projection emitted directly in [B, H, N, D] layout — the head
    # transpose folds into the matmul epilogue instead of a separate copy.
    wqkv = block["qkv"]["kernel"].astype(normed.dtype).reshape(
        cfg.dim, 3, cfg.heads, cfg.dim_head)
    q, k, v = [
        jnp.einsum("bnd,dhe->bhne", normed, wqkv[:, i],
                   preferred_element_type=jnp.float32,
                   precision=prec).astype(normed.dtype)
        for i in range(3)
    ]
    drop_rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    out = sdpa(q, k, v, scale=cfg.dim_head ** -0.5,
               dropout_rate=cfg.dropout, dropout_rng=drop_rngs[0],
               deterministic=deterministic, impl=cfg.impl, n_valid=n_valid)
    if cfg.project_out:
        # Head-merge + output projection in one contraction (no transpose).
        wout = block["attn_out"]["kernel"].astype(out.dtype).reshape(
            cfg.heads, cfg.dim_head, cfg.dim)
        proj = jnp.einsum("bhne,hed->bnd", out, wout,
                          preferred_element_type=jnp.float32, precision=prec)
        proj = (proj + block["attn_out"]["bias"].astype(jnp.float32)
                ).astype(normed.dtype)
        return nn.dropout(drop_rngs[1], proj, cfg.dropout, deterministic), ln_act
    out = out.transpose(0, 2, 1, 3).reshape(b, n, cfg.inner_dim)
    return out, ln_act


def _attention_residual(block: dict, x: jax.Array, cfg: ViTConfig, *,
                        deterministic: bool, rng: Optional[jax.Array],
                        n_valid: Optional[int] = None) -> jax.Array:
    """x + MHSA(LN(x)) via the fully fused attention path: LN+QKV kernel
    (ops/fused_qkv.py, bnhd output) -> flash attention in bnhd layout ->
    out-projection + dropout + residual kernel (ops/fused_outproj.py).
    No standalone LayerNorm, no head transpose, no separate dropout or
    residual pass touches HBM. Falls back to the XLA composition when the
    kernels don't apply (non-pallas impl, identity out-proj, CPU dropout).

    int8-quantized blocks (serving.Predictor(quant="int8") — ``*_q8``
    entries from ops/int8_serving.quantize_blocks) take the int8-MXU
    serving path: LN+rowquant+int8 QKV -> bf16 flash attention -> int8
    out-projection+residual. Deterministic only."""
    if "qkv_q8" in block:
        if not deterministic:
            raise ValueError("int8-quantized blocks are serving-only "
                             "(deterministic=True)")
        from neurovit_tpu.ops import int8_serving
        b, n, _ = x.shape
        q, k, v = int8_serving.int8_ln_qkv(block, x, cfg.heads, cfg.dim_head)
        if cfg.int8_attn != "off":
            # Round 4: PV on the int8 MXU too (QK^T/softmax stay exact —
            # see ops/int8_serving.int8_flash_attention).
            out = int8_serving.int8_flash_attention(
                q, k, v, scale=cfg.dim_head ** -0.5, n_valid=n_valid)
        else:
            from neurovit_tpu.ops.flash_attention import flash_attention
            out = flash_attention(q, k, v, scale=cfg.dim_head ** -0.5,
                                  dropout_rate=0.0, dropout_rng=None,
                                  n_valid=n_valid, layout="bnhd")
        attn2d = out.reshape(b, n, cfg.inner_dim)
        return int8_serving.int8_outproj_residual(block["attn_out_q8"], x,
                                                  attn2d)
    if cfg.impl == "pallas" and cfg.project_out:
        import os

        from neurovit_tpu.ops import fused_outproj, fused_qkv
        from neurovit_tpu.ops.flash_attention import flash_attention
        if fused_outproj.supports(cfg.dropout, deterministic):
            b, n, _ = x.shape
            drop_rngs = (jax.random.split(rng, 2) if rng is not None
                         else (None, None))
            if os.environ.get("NEUROVIT_QKV_IMPL", "pallas") == "xla":
                # A/B variant: XLA LN + einsum straight to the bnhe layout.
                normed = nn.layer_norm(block["attn_norm"], x)
                wqkv = block["qkv"]["kernel"].astype(normed.dtype).reshape(
                    cfg.dim, 3, cfg.heads, cfg.dim_head)
                prec = nn.matmul_precision(normed.dtype)
                q, k, v = (
                    jnp.einsum("bnd,dhe->bnhe", normed, wqkv[:, i],
                               preferred_element_type=jnp.float32,
                               precision=prec).astype(normed.dtype)
                    for i in range(3))
            else:
                q, k, v = fused_qkv.fused_ln_qkv(block, x, cfg.heads,
                                                 cfg.dim_head)
            rate = 0.0 if deterministic else cfg.dropout
            out = flash_attention(q, k, v, scale=cfg.dim_head ** -0.5,
                                  dropout_rate=rate,
                                  dropout_rng=drop_rngs[0],
                                  n_valid=n_valid, layout="bnhd")
            attn2d = out.reshape(b, n, cfg.inner_dim)
            return fused_outproj.fused_outproj_residual(
                block["attn_out"], x, attn2d, dropout_rate=cfg.dropout,
                rng=drop_rngs[1], deterministic=deterministic)
    attn_out, _ = _attention(block, x, cfg, deterministic=deterministic,
                             rng=rng, n_valid=n_valid)
    return attn_out + x


def _mlp(block: dict, x: jax.Array, cfg: ViTConfig, *,
         deterministic: bool, rng: Optional[jax.Array]) -> jax.Array:
    """LN -> Linear -> GELU -> Drop -> Linear -> Drop (vit_3d.py:14-26)."""
    drop_rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    h = nn.layer_norm(block["mlp_norm"], x)
    h = nn.gelu(nn.linear(block["fc1"], h))
    h = nn.dropout(drop_rngs[0], h, cfg.dropout, deterministic)
    h = nn.linear(block["fc2"], h)
    return nn.dropout(drop_rngs[1], h, cfg.dropout, deterministic)


def _mlp_residual(block: dict, x: jax.Array, cfg: ViTConfig, *,
                  deterministic: bool, rng: Optional[jax.Array]) -> jax.Array:
    """x + MLP(x), dispatching to the fused Pallas block kernel on the
    pallas impl (ops/fused_mlp.py — LN, matmuls, GELU, dropout, and the
    residual add in one kernel, weights VMEM-resident), or to the int8-MXU
    serving kernel for quantized blocks (ops/int8_serving.py)."""
    if "fc1_q8" in block:
        if not deterministic:
            raise ValueError("int8-quantized blocks are serving-only "
                             "(deterministic=True)")
        from neurovit_tpu.ops import int8_serving
        return int8_serving.int8_mlp_block(block, x)
    if cfg.impl == "pallas":
        from neurovit_tpu.ops import fused_mlp
        if fused_mlp.supports(cfg.dropout, deterministic):
            return fused_mlp.fused_mlp_block(
                block, x, dropout_rate=cfg.dropout, rng=rng,
                deterministic=deterministic)
    return _mlp(block, x, cfg, deterministic=deterministic, rng=rng) + x


def _block_apply(block: dict, x: jax.Array, cfg: ViTConfig, *,
                 deterministic: bool, rng: Optional[jax.Array],
                 probe_shift: Optional[jax.Array] = None,
                 n_valid: Optional[int] = None,
                 need_probe: bool = False):
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    if need_probe or probe_shift is not None:
        from neurovit_tpu.ops.int8_serving import is_quantized
        if is_quantized(block):
            raise ValueError("the Grad-CAM probe needs the bf16 weights — "
                             "int8-quantized params are serving-only")
        # Grad-CAM path: the attention LN activation must be observable
        # (reference hook target, NeuroEncoder.py:70-82) — XLA composition.
        attn_out, ln_act = _attention(
            block, x, cfg, deterministic=deterministic, rng=rngs[0],
            probe_shift=probe_shift, n_valid=n_valid)
        x = attn_out + x
    else:
        x = _attention_residual(block, x, cfg, deterministic=deterministic,
                                rng=rngs[0], n_valid=n_valid)
        ln_act = None
    x = _mlp_residual(block, x, cfg, deterministic=deterministic, rng=rngs[1])
    return x, ln_act


def apply(params: dict, volume: jax.Array, cfg: ViTConfig, *,
          deterministic: bool = True, rng: Optional[jax.Array] = None,
          probe_shift: Optional[jax.Array] = None,
          compute_dtype=jnp.float32):
    """Forward pass. [B, C, F, H, W] -> logits [B, num_classes].

    Returns ``(logits, probe_activation)`` where ``probe_activation`` is the
    LayerNorm output inside the *last* attention block (the reference's
    Grad-CAM hook target, NeuroEncoder.py:70-82). Pass ``probe_shift`` (zeros
    of shape [B, N+1, dim]) and differentiate w.r.t. it to obtain the hook
    gradients via jax.vjp. Without a ``probe_shift`` the probe is ``None``
    and the last block takes the fused attention path like every other
    block (no observable-LN tax during plain training).
    """
    x = _patch_embed(params["patch_embed"], volume.astype(compute_dtype), cfg)

    b, n, _ = x.shape
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype),
                           (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"][:, : n + 1].astype(compute_dtype)
    rngs = jax.random.split(rng, cfg.depth + 1) if rng is not None else None
    x = nn.dropout(rngs[0] if rngs is not None else None, x,
                   cfg.emb_dropout, deterministic)

    # Padded token stream: with the Pallas attention the whole transformer
    # runs on a lane-aligned sequence (1001 -> 1024) with trailing keys
    # masked in-kernel — no per-layer pad/unpad copies. Row-wise ops (LN,
    # MLP) are padding-safe; pad rows are sliced off before pooling.
    n_valid = n + 1
    from neurovit_tpu.ops.flash_attention import LANE
    pad_stream = cfg.impl == "pallas" and n_valid % LANE != 0
    if pad_stream:
        n_stream = ((n_valid + LANE - 1) // LANE) * LANE
        x = jnp.pad(x, ((0, 0), (0, n_stream - n_valid), (0, 0)))
        if probe_shift is not None:
            probe_shift = jnp.pad(
                probe_shift, ((0, 0), (0, n_stream - n_valid), (0, 0)))
    attn_n_valid = n_valid if pad_stream else None

    # Pipeline-parallel path: all depth blocks run sharded over the mesh's
    # `pipe` axis (GPipe microbatching, parallel/pipeline.py). The Grad-CAM
    # probe path (probe_shift is not None) falls back to the unpipelined
    # composition below — explanation runs are offline/small-batch, and the
    # probe needs the last block unrolled on every device.
    if cfg.pipeline_stages > 1 and probe_shift is None:
        from neurovit_tpu.parallel.pipeline import pipeline_blocks
        use_rng = rngs is not None
        block_rngs = (rngs[1:1 + cfg.depth] if use_rng
                      else jnp.zeros((cfg.depth, 2), dtype=jnp.uint32))

        def pp_block_fn(block, h, block_rng, micro_idx):
            # Fold the microbatch index into the rng: each microbatch is a
            # distinct batch slice and must draw a distinct dropout mask
            # (the raw key would repeat the same mask M times).
            rng = (jax.random.fold_in(block_rng, micro_idx) if use_rng
                   else None)
            return _block_apply(block, h, cfg, deterministic=deterministic,
                                rng=rng, n_valid=attn_n_valid)[0]

        if cfg.remat:
            pp_block_fn = jax.checkpoint(pp_block_fn)
        from neurovit_tpu.ops.int8_serving import is_quantized
        x = pipeline_blocks(pp_block_fn, params["blocks"], block_rngs, x,
                            n_stages=cfg.pipeline_stages,
                            n_micro=cfg.pp_microbatches or None,
                            # Pallas kernels in the block (fused bf16 path
                            # or int8-quantized serving blocks) can't
                            # satisfy the shard_map vma lint; the plain
                            # XLA path keeps it (pipeline.py).
                            contains_pallas=(cfg.impl == "pallas"
                                             or is_quantized(
                                                 params["blocks"])))
        probe_act = None
        # Falls through to the shared pad-slice / pool / head tail below.
    else:
        x, probe_act = _apply_blocks_sequential(
            params, x, cfg, rngs, deterministic, probe_shift, attn_n_valid)

    if pad_stream:
        x = x[:, :n_valid]
        if probe_act is not None:
            probe_act = probe_act[:, :n_valid]

    pooled = jnp.mean(x, axis=1) if cfg.pool == "mean" else x[:, 0]
    pooled = nn.layer_norm(params["head"]["norm"], pooled)
    logits = nn.linear(params["head"]["fc"], pooled)
    return logits.astype(jnp.float32), probe_act


def _apply_blocks_sequential(params, x, cfg, rngs, deterministic,
                             probe_shift, attn_n_valid):
    """The single-device block stack: scan over blocks 0..depth-2, last
    block unrolled so the Grad-CAM probe can attach to its attention
    LayerNorm. Returns (x, probe_act)."""
    # Blocks 0..depth-2 via lax.scan over stacked params; the last block runs
    # unrolled so the Grad-CAM probe attaches to its attention LayerNorm.
    n_scan = cfg.depth - 1
    if n_scan > 0:
        scan_blocks = jax.tree.map(lambda p: p[:n_scan], params["blocks"])
        use_rng = rngs is not None
        scan_rngs = (rngs[1:1 + n_scan] if use_rng
                     else jnp.zeros((n_scan, 2), dtype=jnp.uint32))

        def block_fn(block, h, block_rng):
            return _block_apply(block, h, cfg, deterministic=deterministic,
                                rng=block_rng if use_rng else None,
                                n_valid=attn_n_valid)[0]

        if cfg.remat:
            block_fn = jax.checkpoint(block_fn)

        def body(carry, layer):
            block, block_rng = layer
            return block_fn(block, carry, block_rng), None

        # Full unroll: at depth ~6 the while-loop's dynamic-update-slice
        # traffic on stacked params/grads costs ~15% of a train step
        # (profiled); unrolling keeps the stacked layout but lets XLA use
        # static slices and fuse across blocks.
        x, _ = jax.lax.scan(body, x, (scan_blocks, scan_rngs),
                            unroll=True)

    # The probe (and its unfused XLA attention composition) is only paid when
    # a caller actually asked for it: the Grad-CAM path always passes a
    # probe_shift (explainability/gradcam_vit3d.py:36-40). Plain training
    # runs the last block through the fused path like every other block —
    # the reference's hooks likewise cost nothing unless backward() is
    # driven through them (NeuroEncoder.py:70-82).
    last_block = jax.tree.map(lambda p: p[cfg.depth - 1], params["blocks"])
    x, probe_act = _block_apply(
        last_block, x, cfg, deterministic=deterministic,
        rng=rngs[cfg.depth] if rngs is not None else None,
        probe_shift=probe_shift, n_valid=attn_n_valid,
        need_probe=probe_shift is not None)
    return x, probe_act

"""3D ResNet baseline, pure-functional JAX with explicit BatchNorm state.

Re-implements the reference's Kensho-Hara-style 3D ResNet
(``src/models/resnet_3d.py``): stem Conv3d(k=(t,7,7), stride=(s,2,2)) + BN +
ReLU + MaxPool3d(3,2,1) (resnet_3d.py:116-124), four stages of BasicBlock
(expansion 1) or Bottleneck (expansion 4) with inplanes [64,128,256,512] x
widen_factor, shortcut type 'A' (strided subsample + channel zero-pad,
resnet_3d.py:155-164) or 'B' (1x1x1 conv + BN), AdaptiveAvgPool3d(1) +
Linear head, Kaiming-normal(fan_out, relu) conv init and BN(1, 0) init
(resnet_3d.py:146-153). ``generate_model`` depths {10,18,34,50,101,152,200}
(resnet_3d.py:210-227).

3D convs lower onto the MXU via ``lax.conv_general_dilated``; BatchNorm
running stats live in an explicit ``state`` pytree (momentum 0.1, eps 1e-5 —
torch defaults), updated functionally in train mode.

External layout is NCDHW (torch semantics, incl. OIDHW conv params so torch
state_dicts import/export directly); internal compute is channels-last
NDHWC — the TPU-native conv layout (NCDHW measured 1.5x slower per conv on
the chip; BENCH.md "ResNet").
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from neurovit_tpu import nn

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

BLOCK_LAYOUTS = {
    # depth: (block kind, per-stage block counts)   resnet_3d.py:210-227
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}

STAGE_PLANES = (64, 128, 256, 512)  # get_inplanes(), resnet_3d.py:7-8


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 18
    n_input_channels: int = 3
    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    no_max_pool: bool = False
    shortcut_type: str = "B"
    widen_factor: float = 1.0
    n_classes: int = 400

    def __post_init__(self):
        assert self.depth in BLOCK_LAYOUTS, f"unsupported depth {self.depth}"
        assert self.shortcut_type in ("A", "B")

    @property
    def block_kind(self) -> str:
        return BLOCK_LAYOUTS[self.depth][0]

    @property
    def stage_blocks(self) -> Sequence[int]:
        return BLOCK_LAYOUTS[self.depth][1]

    @property
    def expansion(self) -> int:
        return 1 if self.block_kind == "basic" else 4

    @property
    def stage_planes(self) -> Sequence[int]:
        return [int(p * self.widen_factor) for p in STAGE_PLANES]


# --------------------------------------------------------------------------
# Primitive init/apply
# --------------------------------------------------------------------------

def _conv_init(key, in_ch, out_ch, ksize: Tuple[int, int, int], dtype):
    """Kaiming-normal fan_out/relu (resnet_3d.py:148-150). OIDHW layout."""
    fan_out = out_ch * ksize[0] * ksize[1] * ksize[2]
    std = (2.0 / fan_out) ** 0.5
    return {"kernel": jax.random.normal(
        key, (out_ch, in_ch) + tuple(ksize), dtype) * std}


def _bn_init(ch, dtype):
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), jnp.float32),
             "var": jnp.ones((ch,), jnp.float32)}
    return params, state


def conv3d(params, x, *, stride=(1, 1, 1), padding=(0, 0, 0)):
    # Channels-last compute (NDHWC/DHWIO) — the TPU-native conv layout; the
    # NCDHW form made XLA transpose activations around every conv (measured
    # 1.5x slower per conv, BENCH.md "ResNet"). Params stay OIDHW so torch
    # state_dicts import/export unchanged; the weight transpose here is a
    # few-KB op XLA fuses away. No preferred_element_type: a widened output
    # dtype breaks the conv VJP transpose rule (mixed-dtype cotangent vs
    # bf16 kernel); the TPU conv unit accumulates in f32 internally anyway.
    kernel = params["kernel"].astype(x.dtype).transpose(2, 3, 4, 1, 0)
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=nn.matmul_precision(x.dtype),
    )


def batch_norm(params, state, x, *, train: bool):
    """BatchNorm3d over N,D,H,W per channel (channels-last activations);
    returns (y, new_state).

    NEUROVIT_BN_STATS is read at TRACE time: it selects which stats program
    gets compiled, so it must be set before the first jitted step of the
    process (the A/B benches run separate processes). Flipping it afterwards
    does not retrace.
    """
    xf = x.astype(jnp.float32)
    if train:
        n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
        if os.environ.get("NEUROVIT_BN_STATS", "one_pass") == "two_pass":
            # A/B reference: jnp.var re-reads the activations after the
            # mean reduction (measured 447.6 v/s vs 465.1 one-pass at
            # ResNet-18 b128 — BENCH.md "ResNet").
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.var(xf, axis=(0, 1, 2, 3))
        else:
            # Single sweep: sum and sum-of-squares are sibling reductions
            # over the same operand (XLA fuses them into one pass);
            # var = E[x^2] - mean^2. Post-conv activations are near
            # zero-mean, so the cancellation risk is negligible in f32;
            # clamp guards the pathological case.
            s1 = jnp.sum(xf, axis=(0, 1, 2, 3))
            s2 = jnp.sum(xf * xf, axis=(0, 1, 2, 3))
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
        # torch tracks the *unbiased* variance in running stats.
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS)
    y = y * params["scale"].astype(jnp.float32) \
        + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_state


def max_pool3d(x, ksize=3, stride=2, padding=1):
    pads = [(0, 0)] + [(padding, padding)] * 3 + [(0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, ksize, ksize, ksize, 1),
        window_strides=(1, stride, stride, stride, 1),
        padding=pads)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool3d_taps(x, ksize=3, stride=2, padding=1):
    """``max_pool3d`` with a scatter-free hand-written backward.

    XLA derives ``reduce_window``'s gradient as select-and-scatter, whose
    TPU lowering costs ~29 ms of the b64 ResNet step (BENCH.md "ResNet").
    The forward here IS reduce_window (bit-identical values); the custom
    backward re-slices the padded input into its ksize^3 strided taps,
    masks the upstream gradient where a tap equals the window max, and
    routes each tap's share back with an interior-dilated ``lax.pad`` (the
    exact transpose of a strided slice) — all fusable elementwise work, no
    select-and-scatter. Within-window ties split the gradient equally
    (JAX's reduce-max convention) where torch routes it to one winner; ties
    in post-BN+ReLU activations occur only at exact ReLU zeros, whose
    gradient then dies in the ReLU backward anyway.
    """
    return max_pool3d(x, ksize, stride, padding)


def _max_pool3d_taps_fwd(x, ksize, stride, padding):
    out = max_pool3d(x, ksize, stride, padding)
    return out, (x, out)


def _max_pool3d_taps_bwd(ksize, stride, padding, res, g):
    """Polyphase (parity-sliced) max-pool gradient.

    An input position p = q*stride + r (per dim) is covered by exactly the
    windows w = q - j for j in J(r) = {j : r + stride*j < ksize}; its
    gradient is the sum of share[w] over the covering windows whose max it
    attains. Computing dx one parity class at a time keeps every temp at
    out-size / (input-size / stride^3) — the naive transpose (27 interior-
    dilated full-size pads) materializes ~27x the input and OOMs at real
    batch sizes. The parity slices are then re-interleaved with
    stack+reshape (the inverse of the strided slicing).
    """
    x, out = res
    # The gradient is independent per sample; computing it in batch chunks
    # (sequential lax.map over the leading axis) bounds the live temps —
    # the all-at-once program peaks near ~6x the input size, which OOMs at
    # ResNet bench batches. Chunking trades nothing measurable: the work
    # per chunk is still large fused elementwise sweeps.
    chunk = min(int(os.environ.get("NEUROVIT_MAXPOOL_BWD_CHUNK", "8")),
                x.shape[0])
    while chunk > 1 and x.shape[0] % chunk != 0:
        chunk -= 1   # largest divisor <= requested (never the OOMing
        #              all-at-once program just because B is indivisible)
    if x.shape[0] > chunk:
        n = x.shape[0] // chunk
        dx = jax.lax.map(
            lambda t: _max_pool3d_taps_bwd(ksize, stride, padding,
                                           (t[0], t[1]), t[2])[0],
            (x.reshape((n, chunk) + x.shape[1:]),
             out.reshape((n, chunk) + out.shape[1:]),
             g.reshape((n, chunk) + g.shape[1:])))
        return (dx.reshape(x.shape),)
    B, C = x.shape[0], x.shape[4]
    s = stride
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    # Pad each spatial dim to a multiple of stride so all parity slices
    # have equal length Q (extra high padding is sliced off at the end).
    padded = [d + 2 * padding for d in x.shape[1:4]]
    extra = [(-p) % s for p in padded]
    xp = jnp.pad(
        x, [(0, 0)] + [(padding, padding + e) for e in extra] + [(0, 0)],
        constant_values=neg)
    Q = [(p + e) // s for p, e in zip(padded, extra)]
    out_sz = out.shape[1:4]
    span = [(n - 1) * s + 1 for n in out_sz]

    def tap(kd, kh, kw):
        return jax.lax.slice(
            xp, (0, kd, kh, kw, 0),
            (B, kd + span[0], kh + span[1], kw + span[2], C),
            (1, s, s, s, 1))

    count = sum((tap(kd, kh, kw) == out).astype(jnp.float32)
                for kd in range(ksize) for kh in range(ksize)
                for kw in range(ksize))                 # >= 1: max attained
    share = (g.astype(jnp.float32) / count).astype(g.dtype)
    zero = jnp.zeros((), g.dtype)

    def shift(arr, j):
        """arr_shift[..., q, ...] = arr[..., q - j, ...] on the Q grid.

        Out-of-range entries only need share==0 (the eq mask is irrelevant
        when the share term is zero), so zero-fill is safe for both arrays.
        """
        take = [min(o, q - ji) for o, q, ji in zip(out_sz, Q, j)]
        arr = arr[:, :take[0], :take[1], :take[2], :]
        cfg = [(0, 0)] + [(ji, q - ji - t)
                          for ji, q, t in zip(j, Q, take)] + [(0, 0)]
        return jnp.pad(arr, cfg)

    def J(r):
        return range(-(-(ksize - r) // s))              # r + s*j < ksize

    rows_d = []
    for rd in range(s):
        rows_h = []
        for rh in range(s):
            rows_w = []
            for rw in range(s):
                xpar = jax.lax.slice(
                    xp, (0, rd, rh, rw, 0),
                    (B, rd + (Q[0] - 1) * s + 1, rh + (Q[1] - 1) * s + 1,
                     rw + (Q[2] - 1) * s + 1, C),
                    (1, s, s, s, 1))
                acc = None
                for jd in J(rd):
                    for jh in J(rh):
                        for jw in J(rw):
                            j = (jd, jh, jw)
                            term = jnp.where(xpar == shift(out, j),
                                             shift(share, j), zero)
                            acc = term if acc is None else acc + term
                rows_w.append(acc)
            # Interleave the w parities: [B,Qd,Qh,Qw,s,C] -> w index q*s+r.
            rw_stack = jnp.stack(rows_w, axis=4)
            rows_h.append(rw_stack.reshape(B, Q[0], Q[1], Q[2] * s, C))
        rh_stack = jnp.stack(rows_h, axis=3)
        rows_d.append(rh_stack.reshape(B, Q[0], Q[1] * s, Q[2] * s, C))
    dxp = jnp.stack(rows_d, axis=2).reshape(
        B, Q[0] * s, Q[1] * s, Q[2] * s, C)
    dx = jax.lax.slice(
        dxp, (0, padding, padding, padding, 0),
        (B, padding + x.shape[1], padding + x.shape[2],
         padding + x.shape[3], C))
    return (dx,)


max_pool3d_taps.defvjp(_max_pool3d_taps_fwd, _max_pool3d_taps_bwd)


# --------------------------------------------------------------------------
# Blocks
# --------------------------------------------------------------------------

def _init_basic_block(key, in_planes, planes, stride, cfg, dtype):
    k1, k2, kd = jax.random.split(key, 3)
    conv1 = _conv_init(k1, in_planes, planes, (3, 3, 3), dtype)
    bn1_p, bn1_s = _bn_init(planes, dtype)
    conv2 = _conv_init(k2, planes, planes, (3, 3, 3), dtype)
    bn2_p, bn2_s = _bn_init(planes, dtype)
    params = {"conv1": conv1, "bn1": bn1_p, "conv2": conv2, "bn2": bn2_p}
    state = {"bn1": bn1_s, "bn2": bn2_s}
    _add_downsample(params, state, kd, in_planes, planes, stride, cfg, dtype)
    return params, state


def _init_bottleneck(key, in_planes, planes, stride, cfg, dtype):
    k1, k2, k3, kd = jax.random.split(key, 4)
    out_planes = planes * 4
    params, state = {}, {}
    params["conv1"] = _conv_init(k1, in_planes, planes, (1, 1, 1), dtype)
    params["bn1"], state["bn1"] = _bn_init(planes, dtype)
    params["conv2"] = _conv_init(k2, planes, planes, (3, 3, 3), dtype)
    params["bn2"], state["bn2"] = _bn_init(planes, dtype)
    params["conv3"] = _conv_init(k3, planes, out_planes, (1, 1, 1), dtype)
    params["bn3"], state["bn3"] = _bn_init(out_planes, dtype)
    _add_downsample(params, state, kd, in_planes, out_planes, stride, cfg, dtype)
    return params, state


def _add_downsample(params, state, key, in_planes, out_planes, stride, cfg, dtype):
    """Shortcut when stride != 1 or channels change (resnet_3d.py:166-176)."""
    if stride == 1 and in_planes == out_planes:
        return
    if cfg.shortcut_type == "B":
        params["ds_conv"] = _conv_init(key, in_planes, out_planes, (1, 1, 1), dtype)
        params["ds_bn"], state["ds_bn"] = _bn_init(out_planes, dtype)
    # type 'A' has no parameters (subsample + zero-pad, resnet_3d.py:155-164)


def _shortcut(params, state, x, out_planes, stride, cfg, *, train):
    if "ds_conv" in params:
        r = conv3d(params["ds_conv"], x, stride=(stride,) * 3)
        r, new_bn = batch_norm(params["ds_bn"], state["ds_bn"], r, train=train)
        return r, {"ds_bn": new_bn}
    if stride != 1 or x.shape[-1] != out_planes:
        # Type 'A': avg_pool3d(kernel=1, stride=s) == strided subsample, then
        # zero-pad the channel dim (resnet_3d.py:155-164).
        r = x[:, ::stride, ::stride, ::stride, :]
        pad = out_planes - r.shape[-1]
        r = jnp.pad(r, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
        return r, {}
    return x, {}


def _apply_basic_block(params, state, x, stride, cfg, *, train):
    new_state = {}
    out = conv3d(params["conv1"], x, stride=(stride,) * 3, padding=(1, 1, 1))
    out, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], out, train=train)
    out = jax.nn.relu(out)
    out = conv3d(params["conv2"], out, padding=(1, 1, 1))
    out, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], out, train=train)
    residual, ds_state = _shortcut(params, state, x, out.shape[-1], stride, cfg, train=train)
    new_state.update(ds_state)
    return jax.nn.relu(out + residual), new_state


def _apply_bottleneck(params, state, x, stride, cfg, *, train):
    new_state = {}
    out = conv3d(params["conv1"], x)
    out, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], out, train=train)
    out = jax.nn.relu(out)
    out = conv3d(params["conv2"], out, stride=(stride,) * 3, padding=(1, 1, 1))
    out, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], out, train=train)
    out = jax.nn.relu(out)
    out = conv3d(params["conv3"], out)
    out, new_state["bn3"] = batch_norm(params["bn3"], state["bn3"], out, train=train)
    residual, ds_state = _shortcut(params, state, x, out.shape[-1], stride, cfg, train=train)
    new_state.update(ds_state)
    return jax.nn.relu(out + residual), new_state


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------

def init(key: jax.Array, cfg: ResNetConfig, dtype=jnp.float32) -> dict:
    """Returns {"params": ..., "state": ...} (state = BN running stats)."""
    n_stages = 4
    keys = jax.random.split(key, 2 + n_stages)
    in_planes = cfg.stage_planes[0]
    params = {"conv1": _conv_init(
        keys[0], cfg.n_input_channels, in_planes,
        (cfg.conv1_t_size, 7, 7), dtype)}
    state = {}
    params["bn1"], state["bn1"] = _bn_init(in_planes, dtype)

    init_block = (_init_basic_block if cfg.block_kind == "basic"
                  else _init_bottleneck)
    for s in range(n_stages):
        planes = cfg.stage_planes[s]
        stride = 1 if s == 0 else 2
        blocks_p, blocks_s = [], []
        for b, bkey in enumerate(jax.random.split(keys[2 + s], cfg.stage_blocks[s])):
            bp, bs = init_block(bkey, in_planes, planes,
                                stride if b == 0 else 1, cfg, dtype)
            in_planes = planes * cfg.expansion
            blocks_p.append(bp)
            blocks_s.append(bs)
        params[f"layer{s + 1}"] = blocks_p
        state[f"layer{s + 1}"] = blocks_s

    params["fc"] = nn.linear_init(
        keys[1], cfg.stage_planes[3] * cfg.expansion, cfg.n_classes, dtype=dtype)
    return {"params": params, "state": state}


def apply(params: dict, state: dict, x: jax.Array, cfg: ResNetConfig, *,
          train: bool = False,
          capture_features: bool = False,
          feature_shift: Optional[jax.Array] = None):
    """[B, C, D, H, W] -> (logits, new_state[, features]).

    ``capture_features`` additionally returns the layer4 output — the CAM
    target used by the reference explainability scripts
    (``explainability/xAi_gradcam_Resnet3D/gradcam.py:29-30``: layer4[-1]).
    ``feature_shift`` (zeros of the layer4 shape) is the Grad-CAM probe:
    differentiate w.r.t. it to get hook-style feature gradients.
    """
    new_state = {}
    # External contract stays NCDHW (torch semantics); compute runs
    # channels-last (NDHWC) — the layout XLA's TPU convs want.
    out = x.transpose(0, 2, 3, 4, 1)
    out = conv3d(params["conv1"], out,
                 stride=(cfg.conv1_t_stride, 2, 2),
                 padding=(cfg.conv1_t_size // 2, 3, 3))
    out, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], out, train=train)
    out = jax.nn.relu(out)
    if not cfg.no_max_pool:
        # reduce_window + autodiff (select-and-scatter backward) by
        # default: every measured XLA alternative LOST on-chip (BENCH.md
        # "ResNet" negative results — tap-stack 84 ms vs 24 ms backward,
        # separable 1-D pools 1.6x slower fwd / 1.8x the backward delta).
        # NEUROVIT_MAXPOOL=pallas selects the in-kernel-argmax route
        # (ops/maxpool3d.py: VMEM reshuffles instead of HBM relayouts,
        # torch-style single-winner ties); =taps keeps the scatter-free
        # XLA formulation for A/B on other hardware generations.
        impl = os.environ.get("NEUROVIT_MAXPOOL", "xla")
        if impl == "taps":
            out = max_pool3d_taps(out)
        elif impl == "pallas":
            from neurovit_tpu.ops.maxpool3d import max_pool3d_pallas
            out = max_pool3d_pallas(out)
        else:
            out = max_pool3d(out)

    apply_block = (_apply_basic_block if cfg.block_kind == "basic"
                   else _apply_bottleneck)
    for s in range(4):
        layer = f"layer{s + 1}"
        new_state[layer] = []
        for b, (bp, bs) in enumerate(zip(params[layer], state[layer])):
            stride = 2 if (s > 0 and b == 0) else 1
            out, nbs = apply_block(bp, bs, out, stride, cfg, train=train)
            new_state[layer].append(nbs)
    if feature_shift is not None:
        # feature_shift comes in the external [B, C, D', H', W'] layout.
        out = out + feature_shift.astype(out.dtype).transpose(0, 2, 3, 4, 1)
    features = out.transpose(0, 4, 1, 2, 3)       # layer4, NCDHW for CAMs
    out = jnp.mean(out, axis=(1, 2, 3))           # AdaptiveAvgPool3d(1)
    logits = nn.linear(params["fc"], out).astype(jnp.float32)
    if capture_features:
        return logits, new_state, features
    return logits, new_state

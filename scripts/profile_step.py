"""Capture a device trace of the flagship train step and summarize op costs."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

OUT = "/tmp/nvt_profile"


def run_and_trace_4d():
    """config4D step: frozen ViT encoder over the folded B*T stream +
    temporal transformer + projection head (batch 2, T=140)."""
    from functools import partial

    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    config = load_config("configs/config4D.yaml", overrides={
        "KERNEL_IMPL": "pallas", "TRAINING_PRECISION": "bf16"})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params = variables["params"]
    mask = model.trainable_mask(params)
    tx = optax.masked(optax.adamw(config["TRAINING_LEARNING_RATE"]), mask)
    opt_state = tx.init(params)
    b, t = 2, 140
    x = jnp.asarray(np.random.RandomState(0).randn(b, 90, 90, 90, t),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, b))
    rng = jax.random.key(1, impl="rbg")

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng):
        rng, srng = jax.random.split(rng)

        def loss_fn(p):
            logits, _ = model.apply(p, x, deterministic=False, rng=srng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    for _ in range(3):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    float(loss)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    float(loss)
    jax.profiler.stop_trace()


def run_and_trace():
    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    encoder = os.environ.get("PROFILE_ENCODER", "vit")  # vit | resnet
    batch = int(os.environ.get("PROFILE_BATCH", "64"))
    config = load_config(overrides={
        "DATASET_NAME": "gradcam", "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9, "GRADCAM_CUBE_SIZE": 8,
        "TRAINING_DROPOUT": 0.1, "TRAINING_PRECISION": "bf16",
        "MODEL_VOLUME_ENCODER": encoder,
        "KERNEL_IMPL": "pallas"})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params, model_state = variables["params"], variables["state"]
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 90, 90, 90),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, batch))
    rng = jax.random.key(1, impl="rbg")

    @jax.jit
    def step(params, opt_state, rng):
        rng, srng = jax.random.split(rng)

        def loss_fn(p):
            logits, _ = model.apply(p, x, state=model_state,
                                    deterministic=False, rng=srng,
                                    train=encoder == "resnet")
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    for _ in range(3):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    float(loss)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    float(loss)
    jax.profiler.stop_trace()


def summarize():
    files = glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", OUT)
        for f in glob.glob(os.path.join(OUT, "**", "*"), recursive=True):
            print("  ", f)
        return
    path = max(files, key=os.path.getmtime)
    print("parsing", path)
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find device-lane events (TPU op executions carry 'dur' and names).
    by_name = defaultdict(float)
    total = 0.0
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in str(n) or "/device" in str(n).lower()}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        total += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    print(f"total device-op time: {total/1e3/3:.2f} ms/step (3 steps)")
    for name, dur in top:
        print(f"  {dur/1e3/3:8.2f} ms/step  {name[:110]}")

    # Aggregate by source line. CAVEAT: XLA attributes a whole fusion to one
    # source line, so a "hot" line here may be carrying its fused neighbors
    # (LN, dropout, bias adds) — verify with an end-to-end A/B before acting
    # (we once misread the qkv einsum as slow this way; the plain-matmul
    # "fix" regressed the step 4%).
    by_src = defaultdict(float)
    src_total = 0.0
    for e in events:
        args = e.get("args", {})
        if e.get("ph") != "X" or "long_name" not in args:
            continue
        dur = float(args.get("device_duration_ps", 0)) / 1e12 * 1e3
        by_src[args.get("source", "?")] += dur
        src_total += dur
    print(f"\nby source line ({src_total/3:.1f} ms/step attributed):")
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms/3:8.2f} ms/step  {src}")


if __name__ == "__main__":
    print(jax.devices())
    if os.environ.get("PROFILE_MODE") == "4d":
        run_and_trace_4d()
    else:
        run_and_trace()
    summarize()

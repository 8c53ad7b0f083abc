"""4D training throughput: fMRI sequences/sec (frozen encoder + temporal head).

The north-star's second metric (BASELINE.json): 4D sequences/sec on the
reference configuration — batch 2, T=140 timepoints, 90^3 volumes, frozen
ViT3D volume encoder feeding the temporal transformer (config4D.yaml).
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

B, T = 2, 140


def serving(config):
    """4D serving rows: whole-sequence requests through the Predictor
    (the serving CLI's 4D mode), bf16 and int8 encoder."""
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.serving import Predictor

    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    req = np.random.RandomState(0).randn(1, 90, 90, 90, T).astype(np.float32)
    for quant in (None, "int8"):
        p = Predictor(model, variables, batch_size=2, quant=quant,
                      bucket_sizes=(1,), host_transfer_dtype="bf16")
        p.warmup(seq_len=T)
        p(req)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            p(req)                          # numpy out = hard sync
            times.append(time.perf_counter() - t0)
        ms = sorted(times)[len(times) // 2] * 1e3
        print(f"4D serving ({quant or 'bf16'} encoder, host-bf16): "
              f"{ms:.0f} ms / sequence request "
              f"({T / (ms / 1e3):.1f} volumes/sec incl. host transfer)")


def precompute_pipeline(config):
    """Feature-cache precompute through the DataLoader (threaded host
    reads + prefetch overlapping device encode) on synthetic sequences."""
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.parallel import create_mesh
    from neurovit_tpu.training import feature_cache

    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    n = 8

    class _Seqs:
        def __len__(self):
            return n

        def sample(self, idx):
            rng = np.random.RandomState(idx)
            return {"volume": rng.randn(90, 90, 90, T).astype(np.float32),
                    "label": idx % 2, "subject": f"s{idx}"}

    mesh = create_mesh(config)
    for host_bf16 in (False, True):
        t0 = time.perf_counter()
        view = feature_cache.precompute(model, variables["params"],
                                        variables["state"], _Seqs(), mesh,
                                        batch_size=2, num_workers=4,
                                        host_bf16=host_bf16)
        dt = time.perf_counter() - t0
        assert len(view.feats) == n
        print(f"precompute via DataLoader (host "
              f"{'bf16' if host_bf16 else 'f32'}): {n / dt:.2f} "
              f"sequences/sec ({dt:.1f}s for {n} x T={T} incl. synth + "
              f"transfer)")


def main():
    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    quant = "--int8" in sys.argv
    config = load_config("configs/config4D.yaml", overrides={
        "KERNEL_IMPL": "pallas", "TRAINING_PRECISION": "bf16"})
    if "--serving" in sys.argv:
        serving(config)
        return
    if "--precompute" in sys.argv:
        precompute_pipeline(config)
        return
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params = variables["params"]
    state = variables["state"]
    if quant:
        # TRAINING_4D_ENCODER_QUANT=int8 path: the frozen encoder's GEMMs
        # on the int8 MXU. Exactly like the trainer, the quantized copy
        # rides in model_state (non-differentiated) — params stay bf16.
        from neurovit_tpu.ops import int8_serving
        ve = dict(params["volume_encoder"])
        ve["blocks"] = int8_serving.quantize_blocks(ve["blocks"])
        state = {**state, "q8_volume_encoder": jax.tree.map(jnp.array, ve)}
        print("mode: int8 frozen encoder")
    mask = model.trainable_mask(params)
    tx = optax.masked(optax.adamw(config["TRAINING_LEARNING_RATE"]), mask)
    opt_state = tx.init(params)
    x = jnp.asarray(np.random.RandomState(0).randn(B, 90, 90, 90, T),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, B))
    rng = jax.random.key(1, impl="rbg")

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, state, x, labels):
        rng, srng = jax.random.split(rng)

        def loss_fn(p):
            logits, _ = model.apply(p, x, state=state, deterministic=False,
                                    rng=srng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    t0 = time.perf_counter()
    params, opt_state, rng, loss = step(params, opt_state, rng, state,
                                        x, labels)
    float(loss)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s")
    for _ in range(2):
        params, opt_state, rng, loss = step(params, opt_state, rng, state,
                                            x, labels)
    float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, rng, loss = step(params, opt_state, rng, state,
                                            x, labels)
    float(loss)
    dt = time.perf_counter() - t0
    full_seq_s = B * iters / dt
    print(f"4D train: {full_seq_s:.2f} sequences/sec "
          f"({dt/iters*1e3:.0f} ms/step, {B*T*iters/dt:.1f} volumes/sec "
          f"through the frozen encoder, loss {float(loss):.4f})")

    # ---- feature-cache mode (TRAINING_4D_FEATURE_CACHE) ------------------
    # The frozen encoder is deterministic, so its [T, C] per-sequence
    # outputs are constant across epochs: encode once, then every epoch
    # trains only the temporal head + projection on cached features.
    encode = jax.jit(lambda p, s, x: model.encode_sequence(p, s, x)[0])
    np.asarray(encode(params, state, x))            # compile warm-up
    t0 = time.perf_counter()
    feats = encode(params, state, x)
    np.asarray(feats)                               # hard sync
    t_encode = time.perf_counter() - t0
    print(f"feature-cache precompute: {B/t_encode:.2f} sequences/sec "
          f"one-time ({t_encode*1e3:.0f} ms for the batch)")

    @partial(jax.jit, donate_argnums=(0, 1))
    def feat_step(params, opt_state, rng, feats, labels):
        rng, srng = jax.random.split(rng)

        def loss_fn(p):
            logits = model.apply_features(p, feats, deterministic=False,
                                          rng=srng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    params, opt_state, rng, loss = feat_step(params, opt_state, rng,
                                             feats, labels)
    float(loss)
    feat_iters = 200
    t0 = time.perf_counter()
    for _ in range(feat_iters):
        params, opt_state, rng, loss = feat_step(params, opt_state, rng,
                                                 feats, labels)
    float(loss)
    dt = time.perf_counter() - t0
    cached_seq_s = B * feat_iters / dt
    print(f"4D train (cached epoch): {cached_seq_s:.2f} sequences/sec "
          f"({dt/feat_iters*1e3:.2f} ms/step, {cached_seq_s/full_seq_s:.0f}x "
          f"the full step)")
    for epochs in (5, 10):
        # amortized speedup for an N-epoch run: one precompute pass (~one
        # full-forward epoch) + N cached epochs vs N full epochs.
        full = epochs / full_seq_s
        cached = t_encode / B + epochs / cached_seq_s
        print(f"  {epochs}-epoch run speedup with cache: {full/cached:.1f}x")


if __name__ == "__main__":
    print(jax.devices())
    main()

"""Trainer: jit-compiled train/eval steps over a device mesh.

TPU-native rebuild of the reference's ``src/Trainer.py``:

- single jitted ``train_step`` (donated state buffers) instead of the eager
  autograd loop (Trainer.py:65-76); bf16 compute / f32 params + f32 Adam
  moments replace fp16 GradScaler AMP (Trainer.py:29,68 — TPUs need no loss
  scaling for bf16),
- **working** gradient accumulation keyed on TRAINING_ACCUMULATION_STEP via
  ``optax.MultiSteps`` (the reference's accumulation is commented out,
  Trainer.py:82-86, fixed per SURVEY §2.1.3),
- AdamW(lr, weight_decay) == torch.optim.AdamW defaults (Trainer.py:31),
  masked so the 4D frozen volume encoder is neither updated nor decayed
  (requires_grad=False equivalent),
- CrossEntropyLoss on the dataset's canonical label (Trainer.py:30,70),
- batch data-parallelism: batches sharded over the mesh ``data`` axis,
  params replicated (or TP-sharded), XLA inserts the gradient psum,
- logging every 10% of batches and per-epoch validation in the reference's
  exact print format (Trainer.py:89-99,114-118), with device->host metric
  fetches deferred to the log boundary so the step pipeline stays async,
- checkpoints each epoch: rolling ``last_model`` + timestamped per-epoch
  (Trainer.py:54-56), as Orbax full train state (params+opt+epoch, enabling
  true resume the reference lacks, SURVEY §5.4) plus a torch-style
  state-dict pickle for cross-framework parity,
- ``evaluate_samples``: inference sweep printing accuracy + wrong
  predictions (Trainer.py:120-166).
"""

from __future__ import annotations

import datetime
import os
import signal
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurovit_tpu.data.loader import DataLoader
from neurovit_tpu.models.neuro_encoder import NeuroEncoder
from neurovit_tpu.parallel import (create_mesh, param_shardings,
                                   replicated, shard_batch)
from neurovit_tpu.parallel import distributed
from neurovit_tpu.training.metrics import MetricLogger
from neurovit_tpu.training import checkpoint as ckpt


def _masked_mean_ce(logits, labels, valid):
    """CE/accuracy over the valid (non-pad) slice of the batch."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    per_sample = logz - gold
    valid_f = valid.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(valid_f), 1.0)
    loss = jnp.sum(per_sample * valid_f) / count
    correct = jnp.sum((jnp.argmax(logits, axis=-1) == labels) * valid)
    return loss, correct, jnp.sum(valid)


class Trainer:
    def __init__(self, config: Dict[str, Any], model: NeuroEncoder,
                 dataset_train, dataset_val, *,
                 variables: Optional[Dict] = None,
                 mesh=None, logger: Optional[MetricLogger] = None):
        self.config = config
        self.model = model
        self.output_dir = config["GLOBAL_OUTPUT_DIR"]
        self.epochs = config["TRAINING_EPOCHS"]
        self.batch_size = config["TRAINING_BATCH_SIZE"]
        self.num_workers = config.get("TRAINING_NUM_WORKERS", 8)
        self.mesh = mesh if mesh is not None else create_mesh(config)
        self.logger = logger if logger is not None else MetricLogger(config)

        self.data = dataset_train
        self.val_data = dataset_val
        self._preempt_requested = False
        seed = config.get("TRAINING_SEED", 42)
        # Multi-host: each process loads a disjoint 1/world slice of the
        # index space (same shuffle everywhere, equal batch counts) and
        # parallel.shard_batch assembles the global batch from the local
        # rows. Single host: the full index space.
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        self._seed, self._shard = seed, shard
        self.dataloader = DataLoader(
            dataset_train, self.batch_size, shuffle=True,
            num_workers=self.num_workers, seed=seed, shard=shard)
        self.val_dataloader = DataLoader(
            dataset_val, self.batch_size, shuffle=False,
            num_workers=self.num_workers, seed=seed, shard=shard)

        # ---- parameters / optimizer ------------------------------------
        if variables is None:
            variables = model.init(jax.random.key(seed))
        params, model_state = variables["params"], variables["state"]
        # TRAINING_4D_ENCODER_QUANT: int8 — run the frozen 4D volume
        # encoder's GEMMs on the int8 MXU (ops/int8_serving, the measured
        # +28-29% serving path) during training. The quantized copy lives
        # in model_state (non-differentiated step input): params keep the
        # bf16 weights, so optimizer/checkpoint structure is unchanged and
        # resume/re-quantize is automatic. Opt-in: it perturbs the features
        # the temporal head trains on (~1% GEMM rel err); the convergence
        # gate lives in tests/test_trainer_4d_quant.py.
        quant4d = config.get("TRAINING_4D_ENCODER_QUANT")
        if quant4d not in (None, "", "none", "int8"):
            raise ValueError(f"unknown TRAINING_4D_ENCODER_QUANT {quant4d!r} "
                             "(supported: 'int8')")
        self._quant4d = bool(quant4d == "int8" and model.is_4d)
        if self._quant4d:
            if model.encoder_kind != "vit":
                raise ValueError("TRAINING_4D_ENCODER_QUANT supports the "
                                 "ViT volume encoder only")
            from neurovit_tpu.ops import int8_serving
            q8 = dict(params["volume_encoder"])
            q8["blocks"] = int8_serving.quantize_blocks(q8["blocks"])
            # Fresh buffers: pass-through leaves (patch embed, norms, head)
            # must not alias params — the donated train step would otherwise
            # donate the same buffer via both ts["params"] and
            # ts["model_state"].
            q8 = jax.tree.map(jnp.array, q8)
            model_state = {**model_state, "q8_volume_encoder": q8}
        # TRAINING_HOST_TRANSFER_DTYPE: bf16 — cast volume batches to
        # bfloat16 on the HOST before the device_put. Bit-exact with bf16
        # compute (the model's first device op is volume.astype(bf16), the
        # same round-to-nearest-even cast — tests/test_trainer_synthetic.py
        # pins step-level equality) while halving host->HBM transfer bytes:
        # a real win on transfer-bound hosts (this box's tunneled link moves
        # ~100 MB/s, BENCH.md "showcase") and on any deployment's host link.
        # Refused for f32 compute, where it would genuinely drop mantissa.
        host_dtype = str(config.get("TRAINING_HOST_TRANSFER_DTYPE",
                                    "f32")).lower()
        if host_dtype not in ("f32", "float32", "bf16", "bfloat16"):
            raise ValueError(
                f"unknown TRAINING_HOST_TRANSFER_DTYPE {host_dtype!r} "
                "(supported: 'f32', 'bf16')")
        self._host_bf16 = host_dtype in ("bf16", "bfloat16")
        if (self._host_bf16
                and config.get("TRAINING_PRECISION", "bf16") != "bf16"):
            raise ValueError(
                "TRAINING_HOST_TRANSFER_DTYPE: bf16 requires "
                "TRAINING_PRECISION: bf16 (with f32 compute the host cast "
                "would lose precision the device path keeps)")
        self.accum = max(1, int(config.get("TRAINING_ACCUMULATION_STEP", 1)))
        mask = model.trainable_mask(params)
        from neurovit_tpu.training.optim import build_optimizer
        self.tx, self._lr_fn = build_optimizer(
            config, mask, steps_per_epoch=max(1, len(self.dataloader)))
        # Plateau schedule bookkeeping (reference Trainer.py:32 commented
        # ReduceLROnPlateau(patience=1, factor=0.5), functional here).
        self._plateau = (config.get("TRAINING_LR_SCHEDULE") == "plateau")
        self._plateau_patience = config.get("TRAINING_PLATEAU_PATIENCE", 1)
        self._plateau_factor = config.get("TRAINING_PLATEAU_FACTOR", 0.5)
        self._plateau_best = float("inf")
        self._plateau_bad_epochs = 0

        # Place params replicated (or TP-sharded) on the mesh, batches on the
        # data axis; jit follows input shardings from there.
        p_shard = param_shardings(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, p_shard)
        model_state = jax.device_put(model_state, replicated(self.mesh))
        self._replicate = lambda x: jax.device_put(x, replicated(self.mesh))
        # Optimizer moments mirror the param shardings (TP/pipe-sharded
        # block params keep their Adam state stage-local — replicating it
        # would forfeit pipelining's memory split); scalars (step counts)
        # replicate.
        from neurovit_tpu.parallel.sharding import place_opt_state
        opt_state = place_opt_state(self.tx.init(params), params, p_shard,
                                    self.mesh)
        self.train_state = {
            "params": params,
            "model_state": model_state,
            "opt_state": opt_state,
            "rng": self._replicate(jax.random.key(
                seed + 1, impl=config.get("TRAINING_RNG_IMPL", "rbg"))),
            "epoch": self._replicate(jnp.zeros((), jnp.int32)),
        }

        self._train_step_jit = jax.jit(self._train_step_fn,
                                       donate_argnums=(0,),
                                       static_argnums=(2,))
        self._eval_step_jit = jax.jit(self._eval_step_fn, static_argnums=(3,))

        # 4D frozen-feature cache (training/feature_cache.py): encode each
        # sequence once, then train/validate the temporal head on cached
        # [T, C] features — the encoder share (~98% of the 4D step) is paid
        # a single time instead of every epoch.
        self._use_feature_cache = bool(
            config.get("TRAINING_4D_FEATURE_CACHE", False)) and model.is_4d
        self._feature_cache = None
        if self._use_feature_cache:
            self._feat_train_step_jit = jax.jit(self._feat_train_step_fn,
                                                donate_argnums=(0,))
            self._feat_eval_step_jit = jax.jit(self._feat_eval_step_fn)

        self.log_interval = max(1, len(self.dataloader) // 10)  # Trainer.py:34
        total, trainable = model.param_count(params)
        print(f"Model total parameters: {total/1e6:.2f}M "
              f"(trainable {trainable/1e6:.2f}M and frozen "
              f"{(total-trainable)/1e6:.2f}M)")
        print(f"Number of batches training: {len(self.dataloader)} "
              f"of size {self.batch_size}")
        print(f"Number of batches validation: {len(self.val_dataloader)} "
              f"of size {self.batch_size}")
        print("=" * 50)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _train_step(self, ts, batch, zyx: bool = False):
        # The mesh is scoped (context manager), not process-global: several
        # Trainers with different meshes can coexist in one process. Bare
        # PartitionSpec sharding constraints inside the model (4D B*T stream
        # sharding) resolve against this ambient mesh at trace time.
        with jax.set_mesh(self.mesh):
            return self._train_step_jit(ts, batch, zyx)

    def _eval_step(self, params, model_state, batch, zyx: bool = False):
        with jax.set_mesh(self.mesh):
            return self._eval_step_jit(params, model_state, batch, zyx)

    @staticmethod
    def _model_volume(batch, zyx: bool):
        """[B, X, Y, Z] model input. zyx batches arrive as the raw z-major
        [B, Z, Y, X] buffer (zero host-side transpose — see loader.py
        stack_volumes); the layout transpose happens here, on device, where
        XLA fuses it into the input cast/patch-embed."""
        vol = batch["volume"]
        return vol.transpose(0, 3, 2, 1) if zyx else vol

    def _train_step_fn(self, ts, batch, zyx: bool = False):
        rng, step_rng = jax.random.split(ts["rng"])
        volume = self._model_volume(batch, zyx)

        def loss_fn(params):
            logits, aux = self.model.apply(
                params, volume, state=ts["model_state"],
                deterministic=False, rng=step_rng, train=True)
            loss, correct, count = _masked_mean_ce(
                logits, batch["label"], batch["valid"])
            return loss, (aux["state"], correct, count)

        (loss, (new_model_state, correct, count)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(ts["params"]))
        updates, new_opt_state = self.tx.update(
            grads, ts["opt_state"], ts["params"])
        new_params = optax.apply_updates(ts["params"], updates)
        new_ts = {
            "params": new_params,
            "model_state": new_model_state,
            "opt_state": new_opt_state,
            "rng": rng,
            "epoch": ts["epoch"],
        }
        return new_ts, {"loss": loss, "correct": correct, "count": count}

    def _eval_step_fn(self, params, model_state, batch, zyx: bool = False):
        logits, _ = self.model.apply(
            params, self._model_volume(batch, zyx), state=model_state,
            deterministic=True)
        loss, correct, count = _masked_mean_ce(
            logits, batch["label"], batch["valid"])
        preds = jnp.argmax(logits, axis=-1)
        return {"loss": loss, "correct": correct, "count": count,
                "preds": preds}

    # ---- 4D feature-cache steps (temporal head only) ---------------------
    # Same RNG split discipline as the full step so cached-vs-recompute
    # training consumes identical dropout streams; grads over the full
    # params tree are zeros for the (unused) frozen encoder, exactly as
    # stop_gradient makes them on the volume path.

    def _feat_train_step_fn(self, ts, batch):
        rng, step_rng = jax.random.split(ts["rng"])

        def loss_fn(params):
            logits = self.model.apply_features(
                params, batch["feat"], deterministic=False, rng=step_rng)
            loss, correct, count = _masked_mean_ce(
                logits, batch["label"], batch["valid"])
            return loss, (correct, count)

        (loss, (correct, count)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(ts["params"]))
        updates, new_opt_state = self.tx.update(
            grads, ts["opt_state"], ts["params"])
        new_ts = {
            "params": optax.apply_updates(ts["params"], updates),
            "model_state": ts["model_state"],
            "opt_state": new_opt_state,
            "rng": rng,
            "epoch": ts["epoch"],
        }
        return new_ts, {"loss": loss, "correct": correct, "count": count}

    def _feat_eval_step_fn(self, params, batch):
        logits = self.model.apply_features(params, batch["feat"],
                                           deterministic=True)
        loss, correct, count = _masked_mean_ce(
            logits, batch["label"], batch["valid"])
        return {"loss": loss, "correct": correct, "count": count,
                "preds": jnp.argmax(logits, axis=-1)}

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def _checkpoint_state(self) -> Dict[str, Any]:
        """Train state + scheduler bookkeeping worth persisting. The
        plateau-reduced LR itself already lives in opt_state
        (optim.set_lr); the best-val-loss / bad-epoch counters live here so
        a resumed run does not restart the patience window."""
        state = dict(self.train_state)
        if self._plateau:
            state["plateau"] = {
                "best": jnp.asarray(self._plateau_best, jnp.float32),
                "bad": jnp.asarray(self._plateau_bad_epochs, jnp.int32),
            }
        return state

    def restore(self, path: str) -> None:
        """True mid-run resume: params + optimizer + epoch + RNG (+ plateau
        scheduler counters when that schedule is active).

        Orbax restores against a structural template, so the template must
        match what the checkpoint actually contains: try the
        current-schedule shape first, then the alternative (checkpoints
        saved before the plateau entry existed, or saved under a different
        TRAINING_LR_SCHEDULE, still resume — the counters just start
        fresh/are dropped)."""
        ckpt.wait_for_async_saves()   # never read a still-writing checkpoint
        primary = self._checkpoint_state()
        alternate = dict(self.train_state)
        if "plateau" not in primary:
            alternate["plateau"] = {
                "best": jnp.zeros((), jnp.float32),
                "bad": jnp.zeros((), jnp.int32),
            }
        try:
            restored = ckpt.load_train_state(path, primary)
        except Exception:
            restored = ckpt.load_train_state(path, alternate)
        plateau = restored.pop("plateau", None)
        if self._plateau and plateau is not None:
            self._plateau_best = float(plateau["best"])
            self._plateau_bad_epochs = int(plateau["bad"])
        self.train_state = restored

    # ---- preemption-safe checkpointing ---------------------------------
    # TPU workers get preempted/maintenance-rescheduled routinely in
    # production; SIGTERM is the warning shot. The reference loses the whole
    # run (bare per-epoch weight saves, no optimizer/epoch state — SURVEY
    # §5.4); here the signal requests a full train-state save at the next
    # batch boundary, resumable with --resume.

    def request_preempt(self, *_args) -> None:
        """Ask the trainer to checkpoint and stop at the next safe boundary.
        Signal-handler safe: only sets a flag."""
        self._preempt_requested = True

    def _install_preempt_handlers(self):
        """SIGTERM/SIGINT -> request_preempt, for the duration of run().
        Returns a restore() callback. First signal requests the graceful
        save; the original handler is re-installed immediately so a second
        signal falls through (a stuck save stays interruptible)."""
        if not self.config.get("TRAINING_PREEMPTION_SAVE", True):
            return lambda: None
        if threading.current_thread() is not threading.main_thread():
            return lambda: None        # signal.signal: main thread only
        previous = {}

        def handler(sig, _frame):
            self.request_preempt()
            signal.signal(sig, previous[sig])
            print(f"Signal {sig}: saving train state at the next batch "
                  f"boundary (repeat to force-stop)")

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):
                pass

        def restore():
            for sig, old in previous.items():
                if signal.getsignal(sig) is handler:
                    signal.signal(sig, old)
        return restore

    def _maybe_preempt_save(self, path: str) -> bool:
        if not self._preempt_requested:
            return False
        save_path = os.path.join(path, "model-preempt")
        # train_state["epoch"] still holds the in-progress epoch, so a
        # --resume re-runs it from the top with consistent optimizer/RNG.
        ckpt.save_train_state(save_path, self._checkpoint_state(), self.model)
        print(f"PREEMPTED: train state saved to .{save_path}  "
              f"(resume with --resume {save_path})")
        return True

    def run(self) -> None:
        timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        path = f"{self.output_dir}/{timestamp}"
        os.makedirs(path, exist_ok=True)

        print(f"Running on mesh: {dict(self.mesh.shape)} "
              f"({jax.default_backend()})")
        start_epoch = int(self.train_state["epoch"])
        restore_handlers = self._install_preempt_handlers()
        try:
            for epoch in range(start_epoch, self.epochs):
                self.train(epoch)
                if self._maybe_preempt_save(path):
                    return
                self.validate(epoch)
                self.train_state["epoch"] = self._replicate(
                    jnp.asarray(epoch + 1, jnp.int32))
                # TRAINING_ASYNC_CHECKPOINT overlaps the Orbax disk write
                # with the next epoch (the device->host copy still happens
                # before the next donated step can clobber the buffers);
                # the run-exit wait below commits the last one.
                ckpt.save_train_state(
                    os.path.join(path, f"model-e{epoch}"),
                    self._checkpoint_state(), self.model,
                    asynchronous=bool(
                        self.config.get("TRAINING_ASYNC_CHECKPOINT", False)))
                ckpt.save_last_model(self.train_state, self.model)
                print(f"MODEL SAVED to .{path}/model-e{epoch}")
                if self._preempt_requested:
                    # The per-epoch checkpoint just written IS the resume
                    # point; no extra save needed (committed by the exit
                    # wait below even in async mode).
                    print(f"PREEMPTED: exiting after epoch {epoch} save")
                    return
        finally:
            ckpt.wait_for_async_saves()
            restore_handlers()

    def _device_prefetch(self, loader, features: bool = False):
        """Yield device-resident batches one transfer ahead of consumption,
        overlapping host->HBM transfer with the device step."""
        it = iter(loader)
        pending = None
        prep = self._device_batch_features if features else self._device_batch
        for batch in it:
            ready = pending
            host, zyx = prep(batch)
            pending = (shard_batch(host, self.mesh,
                                   replicate=self.model.is_4d), zyx)
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending

    def _ensure_feature_cache(self) -> None:
        """Build the 4D frozen-feature cache + its loaders on first use
        (TRAINING_4D_FEATURE_CACHE). On a multi-process mesh every host
        encodes the full dataset (duplicate but tiny: the cache is ~1 KB
        per sample) and the cached loaders shard identically to the volume
        loaders.

        TRAINING_4D_FEATURE_CACHE_DIR (opt-in) persists the views to disk
        keyed by a (frozen-encoder params, quant mode, dataset size)
        fingerprint, so a restarted process — e.g. a run_bounded segment
        recycle mid-run — skips the precompute pass entirely (the pass is
        one full-forward epoch over the corpus; at T=140 each sequence is
        a ~200-400 MB host transfer). A mismatched fingerprint (different
        checkpoint, quant flag, or corpus) ignores the file and rebuilds.
        Multi-process: every host writes the same bytes via tmp+rename;
        last writer wins harmlessly."""
        if not self._use_feature_cache or self._feature_cache is not None:
            return
        import os

        from neurovit_tpu.training import feature_cache
        params = self.train_state["params"]
        state = self.train_state["model_state"]
        cache_dir = self.config.get("TRAINING_4D_FEATURE_CACHE_DIR")
        datasets = {"train": self.data, "val": self.val_data}
        fps, views = {}, {}
        for split, ds in datasets.items():
            if not cache_dir:
                continue
            os.makedirs(cache_dir, exist_ok=True)
            fps[split] = feature_cache.fingerprint(
                params["volume_encoder"], self._quant4d, ds)
            view = feature_cache.load_view(
                os.path.join(cache_dir, f"feats_{split}.npz"), fps[split])
            if view is not None:
                print(f"[4D FEATURE CACHE] loaded persisted {split} cache "
                      f"({len(view)} sequences, fingerprint {fps[split]})")
                views[split] = view
        for split, ds in datasets.items():
            if split in views:
                continue
            views[split] = feature_cache.precompute(
                self.model, params, state, ds, self.mesh,
                batch_size=self.batch_size, num_workers=self.num_workers,
                host_bf16=self._host_bf16)
            if cache_dir:
                feature_cache.save_view(
                    os.path.join(cache_dir, f"feats_{split}.npz"),
                    views[split], fps[split])
        self._feature_cache = views
        self._feat_dataloader = DataLoader(
            views["train"], self.batch_size, shuffle=True,
            num_workers=self.num_workers, seed=self._seed, shard=self._shard)
        self._feat_val_dataloader = DataLoader(
            views["val"], self.batch_size, shuffle=False,
            num_workers=self.num_workers, seed=self._seed, shard=self._shard)

    def train(self, epoch: int) -> None:
        self._ensure_feature_cache()
        cached = self._feature_cache is not None
        loader = self._feat_dataloader if cached else self.dataloader
        loader.set_epoch(epoch)
        running: list = []
        start_time = time.time()
        # Optional profiler capture of a step window in the first epoch
        # (TRAINING_PROFILE_STEPS > 0 -> trace into GLOBAL_OUTPUT_DIR/profile).
        profile_steps = (self.config.get("TRAINING_PROFILE_STEPS", 0)
                         if epoch == 0 else 0)
        for i, (batch, zyx) in enumerate(
                self._device_prefetch(loader, features=cached)):
            if self._preempt_requested:
                break                    # run() saves the preempt state
            if profile_steps and i == 2:
                jax.profiler.start_trace(
                    os.path.join(self.output_dir, "profile"))
            if cached:
                with jax.set_mesh(self.mesh):
                    self.train_state, metrics = self._feat_train_step_jit(
                        self.train_state, batch)
            else:
                self.train_state, metrics = self._train_step(self.train_state,
                                                             batch, zyx)
            if profile_steps and i == 2 + profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profile_steps = 0
            running.append(metrics)  # device arrays; fetched at log boundary

            if i != 0 and i % self.log_interval == 0:
                window = running  # cleared at each log boundary
                avg_loss = round(float(np.mean([m["loss"] for m in window])), 5)
                correct = float(np.sum([m["correct"] for m in window]))
                total = float(np.sum([m["count"] for m in window]))
                accuracy = round(correct / max(total, 1), 5)
                lr = round(self._lr_fn(self.train_state["opt_state"]), 5)
                duration = time.time() - start_time
                print(f"epoch {epoch}\t| batch {i}/{len(self.dataloader)}\t| "
                      f"train_loss: {avg_loss:.5f}\t| train_accuracy: "
                      f"{accuracy:.5f}\t| learning_rate: {lr:.5f}\t| "
                      f"duration: {duration:.2f}s")
                self.logger.log({"epoch": epoch, "batch": i,
                                 "train_loss": avg_loss,
                                 "train_accuracy": accuracy,
                                 "learning_rate": lr, "duration": duration})
                running = []
                start_time = time.time()

    def validate(self, epoch: int) -> None:
        self._ensure_feature_cache()
        cached = self._feature_cache is not None
        losses, correct, total = [], 0.0, 0.0
        i = -1
        val_loader = self._feat_val_dataloader if cached else self.val_dataloader
        for i, batch in enumerate(val_loader):
            if cached:
                host, _ = self._device_batch_features(batch)
                batch = shard_batch(host, self.mesh, replicate=True)
                with jax.set_mesh(self.mesh):
                    m = self._feat_eval_step_jit(self.train_state["params"],
                                                 batch)
            else:
                host, zyx = self._device_batch(batch)
                batch = shard_batch(host, self.mesh,
                                    replicate=self.model.is_4d)
                m = self._eval_step(self.train_state["params"],
                                    self.train_state["model_state"], batch,
                                    zyx)
            losses.append(m["loss"])
            correct += float(m["correct"])
            total += float(m["count"])
        avg_val_loss = round(float(np.mean([float(l) for l in losses])), 5)
        self.val_loss = avg_val_loss
        accuracy = round(correct / max(total, 1), 5)
        print(f"[VALIDATION] epoch {epoch}\t| total_batch {i}\t| "
              f"val_loss {avg_val_loss:.5f}\t| val_accuracy {accuracy:.5f}")
        self.logger.log({"epoch": epoch, "val_loss": avg_val_loss,
                         "val_accuracy": accuracy})
        if self._plateau:
            self._plateau_step(avg_val_loss)

    def _plateau_step(self, val_loss: float) -> None:
        """Halve the LR after `patience` epochs without val_loss improvement."""
        if val_loss < self._plateau_best - 1e-8:
            self._plateau_best = val_loss
            self._plateau_bad_epochs = 0
            return
        self._plateau_bad_epochs += 1
        if self._plateau_bad_epochs > self._plateau_patience:
            new_lr = (self._lr_fn(self.train_state["opt_state"])
                      * self._plateau_factor)
            self.train_state["opt_state"] = self._lr_fn.set_lr(
                self.train_state["opt_state"], new_lr)
            self._plateau_bad_epochs = 0
            print(f"[LR PLATEAU] reducing learning rate to {new_lr:.6f}")

    def evaluate_samples(self) -> float:
        """Inference sweep over the validation set (Trainer.py:120-166)."""
        print("=" * 50)
        print(f"Training set has {len(self.data)} samples and validation set "
              f"has {len(self.val_data)} samples.")
        print(f"Training loader has {len(self.dataloader)} batches and "
              f"validation loader has {len(self.val_dataloader)} batches.")
        n_correct, n_total = 0, 0
        wrong_predictions = []
        for batch in self.val_dataloader:
            host_batch, zyx = self._device_batch(batch)  # padded to mesh mult
            device_batch = shard_batch(host_batch, self.mesh,
                                       replicate=self.model.is_4d)
            m = self._eval_step(self.train_state["params"],
                                self.train_state["model_state"], device_batch,
                                zyx)
            # On a multi-process mesh preds is a global (non-fully-
            # addressable) array; take this process's rows, which align
            # with host_batch's local labels/valid (parallel.distributed).
            preds = distributed.local_rows(m["preds"])
            labels = host_batch["label"]
            valid = host_batch["valid"]             # padding rows are False
            for j in range(len(preds)):
                if not valid[j]:
                    continue
                n_total += 1
                if preds[j] == labels[j]:
                    n_correct += 1
                else:
                    wrong_predictions.append(
                        (batch["subject"][j], int(preds[j]), int(labels[j])))
        accuracy = n_correct / max(n_total, 1)
        print(f"Accuracy: {accuracy*100:.2f}%")
        print(f"Wrong predictions: {wrong_predictions}")
        return accuracy

    # ------------------------------------------------------------------

    def _device_batch_features(self, batch: Dict[str, Any]):
        """Feature-cache analog of ``_device_batch``: the cached [B, T, C]
        encodings ride the ``volume`` key through the loader (identical
        collation/padding/masking) and ship as ``feat``. Returns
        ``(out, zyx=False)`` to match the prefetcher's contract."""
        out = {
            "feat": np.asarray(batch["volume"], np.float32),
            "label": np.asarray(batch["label"], np.int32),
            "valid": np.asarray(batch["valid"], np.bool_),
        }
        return out, False

    def _device_batch(self, batch: Dict[str, Any]):
        """Select the array fields the jitted steps consume, padded (with
        valid=False rows) so the batch dim divides the data-axis size.

        Returns ``(out, zyx)``. zyx batches (z-major volume memory, see
        loader.stack_volumes) are shipped as their raw C-contiguous
        [B, Z, Y, X] buffer — ``np.asarray`` on the [B, X, Y, Z] view would
        re-transpose every volume on the host, forfeiting the z-major read
        win; the jitted steps transpose on device instead.

        The layout decision is the loader's explicit ``batch["zyx"]`` flag
        (the loader knows which layout it produced); the array-flag sniff
        below is only a tripwire for an upstream copy/transform that changed
        the memory layout without updating the flag — that would silently
        feed transposed volumes to the model, so it's a hard error."""
        from neurovit_tpu.parallel.mesh import DATA_AXIS
        vol = batch["volume"]
        zyx = bool(batch.get("zyx", False)) and not self.model.is_4d
        if zyx:
            looks_zyx = (getattr(vol, "ndim", 0) == 4
                         and vol.dtype == np.float32 and vol.base is not None
                         and vol.transpose(0, 3, 2, 1).flags.c_contiguous
                         and not vol.flags.c_contiguous)
            assert looks_zyx, (
                "batch['zyx'] is set but the volume is not a z-major "
                "transpose view — an upstream copy/transform changed the "
                "memory layout after the loader produced the batch")
        ship = vol.transpose(0, 3, 2, 1) if zyx else np.asarray(vol,
                                                                np.float32)
        if self._host_bf16:
            # Cast the C-contiguous buffer (the raw z-major base for zyx
            # batches — a contiguous elementwise cast, preserving the
            # zero-host-transpose win; the [B,X,Y,Z] stack otherwise).
            # Identical RNE rounding to the device-side astype(bf16) the
            # model would apply to an f32 volume, at half the shipped bytes.
            import ml_dtypes
            ship = ship.astype(ml_dtypes.bfloat16)
        out = {
            "volume": ship,
            "label": np.asarray(batch["label"], np.int32),
            "valid": np.asarray(batch["valid"], np.bool_),
        }
        if self.model.is_4d:
            # 4D batches stay whole on the host; the model shards the folded
            # B*T volume stream over the mesh instead (B is tiny).
            return out, zyx
        d = self.mesh.shape[DATA_AXIS]
        b = out["volume"].shape[0]
        pad = (-b) % d
        if pad:
            # Concatenate preserves the C-contiguous layout either way, so a
            # zyx batch stays zyx after padding.
            out["volume"] = np.concatenate(
                [out["volume"], np.repeat(out["volume"][-1:], pad, axis=0)])
            out["label"] = np.concatenate(
                [out["label"], np.zeros(pad, np.int32)])
            out["valid"] = np.concatenate(
                [out["valid"], np.zeros(pad, np.bool_)])
        return out, zyx

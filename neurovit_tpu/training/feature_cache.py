"""4D frozen-feature cache: encode every sequence once, train on features.

The reference's 4D trainer re-runs the frozen volume encoder over every
B*T volume on EVERY epoch (``src/Trainer.py:43-56`` drives
``NeuroEncoder.forward``, whose encoder is frozen and eval()'d —
``src/models/NeuroEncoder.py:34-36``), which makes the 4D train step ~98%
deterministic recomputation (BENCH.md "4D mode"). Because that encoder is
deterministic and the 4D datasets apply no stochastic transforms
(``src/data/DatasetADNI_4D.py:86-87``), its per-sequence output
([T, num_classes] — ~1 KB per sample) is constant across epochs.

``TRAINING_4D_FEATURE_CACHE: true`` (opt-in) precomputes those encodings in
one pass at the start of training; every epoch then trains only the
temporal head + projection on the cached features. Preconditions (why this
is opt-in, not default): the volume encoder must be frozen (4D mode always
freezes it) and the dataset static across epochs — true for all shipped 4D
datasets; a future augmented 4D pipeline would need the flag off.

Numerics: the cached features are the f32 ``encode_sequence`` outputs, and
``NeuroEncoder.apply_features`` is the identical tail computation the full
forward runs, with the same per-step RNG stream (the trainer splits
``ts["rng"]`` exactly as the volume path does) — cached-vs-recompute
training is equivalent up to XLA re-fusion of the encoder pass
(tests/test_feature_cache_4d.py pins the losses at tight tolerance).

Failed sample reads are cached as ``None`` and skipped by the DataLoader
exactly like the volume path skips them (loader._fetch) — one difference:
a transient I/O failure here is frozen for the run instead of retried each
epoch.

Persistence (``TRAINING_4D_FEATURE_CACHE_DIR``, opt-in): the cached views
can be written to disk keyed by a (frozen-encoder params, quant mode,
dataset size) fingerprint — a restarted process (e.g. a run_bounded
segment recycle) reloads them instead of re-encoding the corpus. See
``fingerprint``/``save_view``/``load_view`` and the Trainer's
``_ensure_feature_cache``.

Quant composition (``TRAINING_4D_ENCODER_QUANT: int8`` + this cache): the
precompute pass calls ``encode_sequence`` with the trainer's model_state,
which routes through the int8 encoder under
``model_state["q8_volume_encoder"]`` when present — so the cached features
ARE the q8-encoder outputs, exactly what the non-cached quant path trains
on every step (pinned in tests/test_feature_cache_4d.py::
test_cache_composes_with_int8_encoder_quant).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureView:
    """In-memory dataset of cached per-sequence features, shaped for the
    standard DataLoader: ``sample(idx)`` returns the cached [T, C] features
    under the ``"volume"`` key so collation, shuffling, sharding, padding
    and valid-masking are byte-identical to the volume loader's."""

    def __init__(self, feats: List[Optional[np.ndarray]], labels: List[int],
                 subjects: List[Any]):
        self.feats = feats
        self.labels = labels
        self.subjects = subjects

    def __len__(self) -> int:
        return len(self.feats)

    def sample(self, idx: int) -> Optional[Dict[str, Any]]:
        feat = self.feats[idx]
        if feat is None:                 # failed read at precompute time
            return None
        return {"volume": feat, "label": self.labels[idx],
                "subject": self.subjects[idx]}

    __getitem__ = sample


def dataset_identity(dataset) -> str:
    """Best-available identity of a dataset for the persisted-cache key.

    Length alone is NOT enough — a different corpus of the same size must
    not silently reuse stale features. The shipped 4D datasets expose
    their row index as ``.data`` (adni4d: pickled CSV rows incl. fMRI
    paths) and their index path as ``.dataset_path``; both are hashed in.
    Custom datasets can expose a ``cache_identity`` attribute (string) to
    participate; otherwise the identity degrades to (type, len) and the
    docstring's warning applies."""
    import hashlib

    ident = getattr(dataset, "cache_identity", None)
    if ident is not None:
        return f"custom:{ident}"
    parts = [type(dataset).__name__, f"n={len(dataset)}"]
    rows = getattr(dataset, "data", None)
    if rows is not None:
        parts.append("rows=" + hashlib.sha256(
            str(rows).encode()).hexdigest()[:16])
    path = getattr(dataset, "dataset_path", None)
    if path is not None:
        parts.append(f"path={path}")
    return ";".join(parts)


def fingerprint(encoder_params, quant4d: bool, dataset) -> str:
    """Cache key for a persisted FeatureView: the cached features are a
    pure function of (frozen encoder params, quant mode, dataset) — the
    q8 encoder derives deterministically from the bf16 params, so the
    quant flag plus the params identify it. Params are reduced on-device
    to one per-leaf f32-sum vector (a single small fetch instead of
    shipping ~350 MB of flagship weights back through the host link) and
    hashed together with every leaf's shape/dtype, the dataset identity
    (see :func:`dataset_identity`), and the quant mode."""
    import hashlib

    leaves = jax.tree.leaves(encoder_params)

    @jax.jit
    def sums(ls):
        return jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in ls])

    h = hashlib.sha256()
    h.update(np.asarray(sums(leaves), np.float32).tobytes())
    for leaf in leaves:
        h.update(str((leaf.shape, str(leaf.dtype))).encode())
    h.update(f"quant={bool(quant4d)};ds={dataset_identity(dataset)}"
             .encode())
    return h.hexdigest()[:16]


def save_view(path: str, view: FeatureView, fp: str) -> None:
    """Persist a FeatureView (npz, no pickle): failed-read slots keep
    their None positions via the ok mask; subjects are stored as
    strings. The tmp name is per-process so concurrent writers on a
    shared filesystem (multi-host meshes — every host computes identical
    bytes) never truncate each other; the final rename is atomic and
    last-writer-wins is harmless."""
    import os

    ok = np.array([f is not None for f in view.feats], np.bool_)
    feats = (np.stack([f for f in view.feats if f is not None])
             if ok.any() else np.zeros((0, 1, 1), np.float32))
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    np.savez(tmp, fp=np.array(fp), ok=ok, feats=feats,
             labels=np.asarray(view.labels, np.int64),
             subjects=np.asarray([str(s) for s in view.subjects]))
    os.replace(tmp, path)


def load_view(path: str, fp: str) -> Optional[FeatureView]:
    """Load a persisted FeatureView; None when the file is absent,
    unreadable/torn (rebuild instead of crashing a restarted run), or
    was written for a different (params, quant, dataset) fingerprint."""
    import os
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if str(z["fp"]) != fp:
                return None
            ok = z["ok"]
            stacked = z["feats"]
            labels = [int(v) for v in z["labels"]]
            subjects = [str(s) for s in z["subjects"]]
    except Exception as e:
        print(f"[4D FEATURE CACHE] ignoring unreadable cache {path} "
              f"({type(e).__name__}: {e}); re-encoding")
        return None
    feats: List[Optional[np.ndarray]] = []
    j = 0
    for is_ok in ok:
        feats.append(stacked[j] if is_ok else None)
        j += int(is_ok)
    return FeatureView(feats, labels, subjects)


class _IndexedView:
    """Dataset wrapper that tags each sample with its index so the batched
    precompute can place features at the right FeatureView slot (failed
    reads stay None at their original position)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self) -> int:
        return len(self.dataset)

    def sample(self, idx: int) -> Optional[Dict[str, Any]]:
        s = self.dataset.sample(idx)
        if s is None:
            return None
        return {"volume": s["volume"], "label": s["label"],
                "subject": s.get("subject", str(idx)), "cache_index": idx}

    __getitem__ = sample


def precompute(model, params, model_state, dataset, mesh, *,
               batch_size: int = 1, num_workers: int = 8,
               host_bf16: bool = False) -> FeatureView:
    """One encoder pass over ``dataset`` -> FeatureView of [T, C] f32
    encodings.

    Sequences stream through the standard DataLoader (threaded sample
    reads + bounded prefetch), so host NIfTI I/O overlaps the device
    encoder just like the volume trainer's epochs do — at a realistic 4D
    corpus the precompute pass is device-bound, not read-bound. Pass the
    trainer's ``batch_size``/``num_workers``; at B sequences per call the
    encoder folds B*T volumes into one MXU batch. A failed ``sample`` read
    is recorded as None at its index (skip-and-mask downstream, mirroring
    loader._fetch). ``model_state`` routing: see the module docstring for
    the int8-encoder-quant composition.

    ``host_bf16`` (the trainer's TRAINING_HOST_TRANSFER_DTYPE contract):
    ship each 4D sequence to the device as bfloat16 — bit-exact under bf16
    compute (the encoder's first device op is the same RNE cast) at half
    the host->HBM bytes; a 4D sequence is ~408 MB in f32, the largest
    single transfer in the framework."""
    from neurovit_tpu.data.loader import DataLoader

    @jax.jit
    def encode(params, model_state, x):
        enc, _, _ = model.encode_sequence(params, model_state, x)
        return enc

    def ship(vols):
        if host_bf16:
            import ml_dtypes
            return jnp.asarray(np.asarray(vols, np.float32)
                               .astype(ml_dtypes.bfloat16))
        return jnp.asarray(vols, jnp.float32)

    t0 = time.time()
    n = len(dataset)
    feats: List[Optional[np.ndarray]] = [None] * n
    labels: List[int] = [0] * n
    subjects: List[Any] = [f"failed-{i}" for i in range(n)]
    loader = DataLoader(_IndexedView(dataset), max(1, batch_size),
                        shuffle=False, num_workers=num_workers)
    n_ok = 0
    for batch in loader:
        with jax.set_mesh(mesh):
            enc = encode(params, model_state, ship(batch["volume"]))
        enc = np.asarray(enc, np.float32)
        for row, ok in enumerate(batch["valid"]):
            if not ok:                    # tail padding
                continue
            idx = batch["cache_index"][row]
            feats[idx] = enc[row]
            labels[idx] = int(batch["label"][row])
            subjects[idx] = batch["subject"][row]
            n_ok += 1
    print(f"[4D FEATURE CACHE] encoded {n_ok} sequences once "
          f"({n - n_ok} failed reads masked) in {time.time() - t0:.1f}s; "
          f"epochs now train the temporal head on cached features")
    return FeatureView(feats, labels, subjects)

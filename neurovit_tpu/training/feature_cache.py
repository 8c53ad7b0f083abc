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


def precompute(model, params, model_state, dataset, mesh) -> FeatureView:
    """One encoder pass over ``dataset`` -> FeatureView of [T, C] f32
    encodings. Sequences are encoded one at a time (B=1 fold -> T volumes
    per call, plenty of MXU work at T~140); a failed ``sample`` read is
    recorded as None (skip-and-mask downstream, mirroring loader._fetch).
    """

    @jax.jit
    def encode(params, model_state, x):
        enc, _, _ = model.encode_sequence(params, model_state, x)
        return enc

    t0 = time.time()
    feats: List[Optional[np.ndarray]] = []
    labels: List[int] = []
    subjects: List[Any] = []
    n_failed = 0
    for i in range(len(dataset)):
        try:
            s = dataset.sample(i)
        except Exception as e:
            print(f"Feature cache: sample {i} failed ({e}); skip-and-mask")
            s = None
        if s is None:
            feats.append(None)
            labels.append(0)
            subjects.append(f"failed-{i}")
            n_failed += 1
            continue
        with jax.set_mesh(mesh):
            enc = encode(params, model_state,
                         jnp.asarray(s["volume"], jnp.float32)[None])
        feats.append(np.asarray(enc[0], np.float32))
        labels.append(int(s["label"]))
        subjects.append(s.get("subject", str(i)))
    n_ok = len(feats) - n_failed
    print(f"[4D FEATURE CACHE] encoded {n_ok} sequences once "
          f"({n_failed} failed reads masked) in {time.time() - t0:.1f}s; "
          f"epochs now train the temporal head on cached features")
    return FeatureView(feats, labels, subjects)

"""Checkpoint-selection helpers of the RSS-bounded run driver.

The driver itself is an environment workaround (the tunnel client's
host-transfer leak, BENCH.md); these pin the resume-point logic it shares
with any kill/restart flow: newest full train-state across run timestamps,
and completed-epoch counting over per-epoch saves.
"""

import os
import time

from scripts.run_bounded import newest_checkpoint, run_epochs_done


def _mk(path):
    os.makedirs(path, exist_ok=True)
    return path


def test_newest_checkpoint_and_epoch_count(tmp_path):
    out = str(tmp_path)
    assert newest_checkpoint(out) is None
    assert run_epochs_done(out) == 0

    run1 = _mk(os.path.join(out, "2026-01-01_00-00-00"))
    e0 = _mk(os.path.join(run1, "model-e0"))
    time.sleep(0.01)
    e1 = _mk(os.path.join(run1, "model-e1"))
    # Sidecar pickles and files must not be picked as resume points.
    open(os.path.join(run1, "model-e1.state_dict.pkl"), "w").close()

    assert newest_checkpoint(out) == e1
    assert run_epochs_done(out) == 2

    # A later segment writes into a NEW timestamp dir; its mid-epoch
    # preempt save becomes the resume point but adds no completed epoch.
    run2 = _mk(os.path.join(out, "2026-01-01_01-00-00"))
    time.sleep(0.01)
    preempt = _mk(os.path.join(run2, "model-preempt"))
    assert newest_checkpoint(out) == preempt
    assert run_epochs_done(out) == 2

    time.sleep(0.01)
    _mk(os.path.join(run2, "model-e2"))
    assert run_epochs_done(out) == 3
    assert newest_checkpoint(out).endswith("model-e2")
    _ = e0

"""Host-RSS-bounded training driver: run main.py in preempt/resume segments.

Why: this box's tunneled TPU client (the experimental `axon` IFRT-proxy
backend) retains a C-level host copy of EVERY host->device transfer — one
full volume batch per step, ~93 MB at flagship scale, reproduced with a
6-line device_put loop and unreclaimable by gc or malloc_trim (see BENCH.md
"host transfer leak"). A long run therefore grows host RSS linearly
(~11.6 GB/epoch on the 4k showcase) until the OOM killer ends it. This is
an environment artifact, not framework state: the trainer holds no
reference to shipped batches (tests/test_loader.py, the bounded prefetch).

Workaround, not a patch: the trainer's preemption machinery (SIGTERM ->
save full train state at the next batch boundary -> exit; `--resume`
restores params+optimizer+epoch+RNG, training/trainer.py) already makes a
kill/restart cycle lossless, so this driver watches the child's RSS and
recycles the process before the kernel does it rudely:

    python scripts/run_bounded.py --rss-gb 60 -- \
        showcase --config /tmp/showcase/showcase16k.yaml --wandb false

Loops until the run reaches TRAINING_EPOCHS (or a child fails without
having been preempted by us).
"""

import argparse
import glob
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, ".")


def child_rss_gb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return 0.0


def newest_checkpoint(output_dir: str) -> "str | None":
    """Latest resumable train-state dir across run timestamps (per-epoch
    model-e* saves and model-preempt mid-epoch saves are both full Orbax
    train states)."""
    cands = [p for p in glob.glob(os.path.join(output_dir, "*", "model-*"))
             if os.path.isdir(p) and not p.endswith(".state_dict.pkl")]
    return max(cands, key=os.path.getmtime) if cands else None


def run_epochs_done(output_dir: str) -> int:
    best = -1
    for p in glob.glob(os.path.join(output_dir, "*", "model-e*")):
        name = os.path.basename(p)
        try:
            best = max(best, int(name.split("model-e")[1].split(".")[0]))
        except ValueError:
            continue
    return best + 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rss-gb", type=float, default=60.0,
                    help="SIGTERM the child when its RSS crosses this")
    ap.add_argument("--poll-s", type=float, default=10.0)
    ap.add_argument("--max-segments", type=int, default=40)
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- then main.py args (name --config ... )")
    args = ap.parse_args()
    main_args = [a for a in args.rest if a != "--"]
    if not main_args:
        ap.error("pass main.py arguments after --")

    # TRAINING_EPOCHS + output dir from the config the child will use.
    from neurovit_tpu.config import load_config
    cfg_path = main_args[main_args.index("--config") + 1]
    config = load_config(cfg_path)
    epochs = int(config["TRAINING_EPOCHS"])
    output_dir = config["GLOBAL_OUTPUT_DIR"]

    for segment in range(args.max_segments):
        done = run_epochs_done(output_dir)
        if done >= epochs:
            print(f"[run_bounded] complete: {done}/{epochs} epochs saved")
            return 0
        cmd = [sys.executable, "-u", "main.py", *main_args]
        resume = newest_checkpoint(output_dir)
        if resume and segment == 0 and "--resume" not in main_args:
            # Fresh launch with stale checkpoints around: only resume if
            # the caller's output dir is dedicated to this run.
            pass
        if resume and segment > 0:
            cmd += ["--resume", resume]
        print(f"[run_bounded] segment {segment}: {' '.join(cmd)}",
              flush=True)
        child = subprocess.Popen(cmd)
        preempted = False
        while child.poll() is None:
            time.sleep(args.poll_s)
            rss = child_rss_gb(child.pid)
            if rss > args.rss_gb and not preempted:
                print(f"[run_bounded] RSS {rss:.1f} GB > {args.rss_gb} GB: "
                      f"SIGTERM (trainer saves + exits at the next batch "
                      f"boundary)", flush=True)
                child.send_signal(signal.SIGTERM)
                preempted = True
        if child.returncode != 0:
            print(f"[run_bounded] child exited rc={child.returncode}")
            return child.returncode
        if not preempted and run_epochs_done(output_dir) >= epochs:
            print(f"[run_bounded] complete after segment {segment}")
            return 0
        if not preempted:
            # Child exited 0 without us preempting and without finishing:
            # it preempted itself or crashed quietly — resume anyway.
            print("[run_bounded] child exited early; resuming")
    print("[run_bounded] max segments reached")
    return 1


if __name__ == "__main__":
    sys.exit(main())

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
import hashlib
import json
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


def run_id_of(config, main_args) -> str:
    """Identity of a run: the resolved config contents + the main.py argv.
    A relaunched driver with the same inputs computes the same id, so its
    own checkpoints are recognized; a different config (or different CLI
    args) in the same output dir is a different run."""
    blob = json.dumps(
        {"config": {k: v for k, v in sorted(config.items())
                    if not k.startswith("_")},
         "argv": list(main_args)},
        sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def claim_run(output_dir: str, run_id: str, main_args) -> bool:
    """Stamp ``output_dir`` as belonging to this run (``.run_bounded.json``).

    Returns True when the dir is already stamped for THIS run — a driver
    restart — so segment 0 may resume from the newest checkpoint. Refuses
    (SystemExit) when the dir is stamped for a DIFFERENT run or holds
    unstamped checkpoints: resuming across runs would splice foreign
    optimizer state into this one, and counting a stranger's model-e* saves
    as ours would declare the run falsely complete."""
    marker = os.path.join(output_dir, ".run_bounded.json")
    if os.path.exists(marker):
        with open(marker) as f:
            stamp = json.load(f)
        if stamp.get("run_id") == run_id:
            return True
        raise SystemExit(
            f"[run_bounded] {output_dir} is stamped for a different run "
            f"(marker {marker}: run_id {stamp.get('run_id')}, argv "
            f"{stamp.get('argv')}). Use a dedicated GLOBAL_OUTPUT_DIR per "
            f"run, or delete the marker to start over.")
    if newest_checkpoint(output_dir) is not None:
        raise SystemExit(
            f"[run_bounded] {output_dir} holds checkpoints but no "
            f"{marker} — they belong to a run this driver did not start. "
            f"Point GLOBAL_OUTPUT_DIR at a dedicated directory (or delete "
            f"the stale checkpoints).")
    os.makedirs(output_dir, exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"run_id": run_id, "argv": list(main_args)}, f)
    os.replace(tmp, marker)
    return False


def child_argv(main_args, output_dir: str, segment: int,
               owns_run: bool) -> list:
    """argv for the next training segment: resume from the newest
    checkpoint on any later segment, and on segment 0 of a RESTARTED
    driver (``owns_run``) — the idempotent relaunch path. A caller
    --resume governs only the FIRST segment of a fresh run (its seed
    checkpoint); once this run has its own saves, the newest one is
    appended last — argparse last-wins — so later segments never re-run
    from the stale seed (which would loop the same epochs until
    max_segments)."""
    cmd = [sys.executable, "-u", "main.py", *main_args]
    resume = newest_checkpoint(output_dir)
    if resume and (segment > 0 or owns_run):
        cmd += ["--resume", resume]
    return cmd


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
    if "--config" not in main_args or \
            main_args.index("--config") + 1 >= len(main_args):
        ap.error("main.py args must include --config <path> (the driver "
                 "reads TRAINING_EPOCHS and GLOBAL_OUTPUT_DIR from it)")
    from neurovit_tpu.config import load_config
    cfg_path = main_args[main_args.index("--config") + 1]
    config = load_config(cfg_path)
    epochs = int(config["TRAINING_EPOCHS"])
    output_dir = config["GLOBAL_OUTPUT_DIR"]

    # Idempotent relaunch: stamp the output dir; a restarted driver with
    # the same config+argv recognizes its own checkpoints and resumes
    # (instead of silently restarting from epoch 0 into a fresh timestamp
    # dir); foreign checkpoints in the dir are refused, not adopted.
    owns_run = claim_run(output_dir, run_id_of(config, main_args), main_args)
    if owns_run:
        print(f"[run_bounded] relaunch detected: {output_dir} is stamped "
              f"for this run; resuming", flush=True)

    for segment in range(args.max_segments):
        done = run_epochs_done(output_dir)
        if done >= epochs:
            print(f"[run_bounded] complete: {done}/{epochs} epochs saved")
            return 0
        cmd = child_argv(main_args, output_dir, segment, owns_run)
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

"""HTTP serving for trained NeuroEncoder checkpoints.

The reference's only inference surface is the offline ``--inference`` eval
sweep (``src/Trainer.py:120-166``); ``neurovit_tpu.serving`` adds the batch
CLI, and this module adds the online surface: a threaded HTTP server around
the bucketed :class:`~neurovit_tpu.serving.Predictor` with **cross-request
micro-batching** — concurrent ``POST /predict`` requests are coalesced into
one compiled step (grouped by volume shape, routed to the smallest latency
bucket that fits), so N simultaneous single-volume clients pay ~one step
instead of N. Single requests still ride the b=1 bucket at the measured
~100 ms request latency (BENCH.md "serving latency buckets").

    python -m neurovit_tpu.serving_http --config config.yaml --port 8000
    curl -s --data-binary @scan.nii localhost:8000/predict | jq .

Takes the batch CLI's serving flags (``--mesh`` device-mesh serving,
``--quant int8``, ``--host-bf16``, ``--buckets``) through the shared
:func:`neurovit_tpu.serving.predictor_from_cli_args` plumbing.

Endpoints:
  GET  /healthz            liveness + model/bucket metadata (JSON)
  POST /predict[?crop=0]   body = one NIfTI (.nii or gzipped .nii.gz);
                           response = one JSON row per (file, timepoint)
                           for 3D checkpoints, one whole-sequence row
                           (timepoint -1) for 4D — the same decomposition
                           and ADNI preprocessing as the batch CLI.
"""

from __future__ import annotations

import json
import os
import queue
import tempfile
import threading
from typing import List, Optional, Tuple

import numpy as np

from neurovit_tpu.serving import (Predictor, _collect_volume_jobs,
                                  predictor_from_cli_args)

# Gzip magic: POST bodies are sniffed, not extension-typed — a client
# streaming a .nii.gz needs no content-type negotiation.
_GZ_MAGIC = b"\x1f\x8b"


class _Pending:
    """One volume awaiting a batched prediction."""

    __slots__ = ("volume", "event", "label", "probs", "error")

    def __init__(self, volume: np.ndarray):
        self.volume = volume
        self.event = threading.Event()
        self.label = None
        self.probs = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Coalesce concurrent prediction requests into shared compiled steps.

    Handler threads enqueue volumes; a single dispatcher thread drains the
    queue, waits up to ``window`` seconds for co-arriving work (bounded at
    the predictor's ``batch_size``), groups by volume shape (requests of
    different spatial shape — or 4D sequences of different T — cannot share
    a compiled step), and runs each group through the predictor, which
    routes it to the smallest compiled bucket that fits. The dispatcher is
    the only thread that touches the predictor, so no locking is needed
    around compilation or the device.
    """

    def __init__(self, predictor: Predictor, window: float = 0.005):
        self.predictor = predictor
        self.window = window
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serving-http-batcher")
        self._thread.start()

    def predict(self, volumes: List[np.ndarray]):
        """Block until every volume is predicted (possibly across several
        shared steps); returns (labels, probs) aligned with ``volumes``."""
        pending = [_Pending(v) for v in volumes]
        for p in pending:
            self._queue.put(p)
        for p in pending:
            p.event.wait()
            if p.error is not None:
                raise p.error
        return ([p.label for p in pending],
                np.stack([p.probs for p in pending]))

    def _loop(self) -> None:
        import time

        while not self._stop.is_set():
            try:
                items = [self._queue.get(timeout=0.1)]
            except queue.Empty:
                continue
            deadline = time.monotonic() + self.window
            while len(items) < self.predictor.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            by_shape = {}
            for item in items:
                by_shape.setdefault(item.volume.shape, []).append(item)
            for group in by_shape.values():
                try:
                    labels, probs = self.predictor(
                        np.stack([g.volume for g in group]))
                    for g, label, p in zip(group, labels, probs):
                        g.label, g.probs = int(label), np.asarray(p)
                except BaseException as exc:  # surface on the caller
                    for g in group:
                        g.error = exc
                finally:
                    for g in group:
                        g.event.set()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join()


def _decode_nifti_jobs(body: bytes, crop: bool, sequence: bool
                       ) -> List[Tuple[int, np.ndarray]]:
    """Parse one POSTed NIfTI body into (timepoint, volume) samples with
    the batch CLI's exact preprocessing (crop + z-score, per-timepoint for
    3D checkpoints / whole-series for 4D) by round-tripping through a temp
    file into serving._collect_volume_jobs.

    Gzipped bodies decompress in memory: routing a unique temp ``.nii.gz``
    per request through ``nifti.readable_path`` would grow the one-time
    decompressed cache by one entry per request for the life of the server.
    """
    if body[:2] == _GZ_MAGIC:
        import gzip
        body = gzip.decompress(body)
    fd, path = tempfile.mkstemp(suffix=".nii")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(body)
        return [(t, vol) for _, t, vol in
                _collect_volume_jobs([path], crop=crop, sequence=sequence)]
    finally:
        os.unlink(path)


def make_server(predictor: Predictor, host: str = "127.0.0.1",
                port: int = 8000, window: float = 0.005):
    """Build (but don't start) the HTTP server; returns (server, batcher).

    ``server.serve_forever()`` runs it; tests drive it on an ephemeral port
    from a thread and call ``server.shutdown()`` + ``batcher.stop()``.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = MicroBatcher(predictor, window=window)
    sequence = bool(predictor.model.is_4d)

    class Handler(BaseHTTPRequestHandler):
        # Served model state is process-wide; the handler only closes over
        # the batcher so ThreadingHTTPServer can instantiate it per request.

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.split("?")[0] != "/healthz":
                self._send(404, {"error": f"no route {self.path}"})
                return
            self._send(200, {
                "status": "ok",
                "is_4d": sequence,
                "batch_size": predictor.batch_size,
                "buckets": list(predictor.bucket_sizes),
                "quant": predictor.quant,
            })

        def do_POST(self):  # noqa: N802
            route, _, query = self.path.partition("?")
            if route != "/predict":
                self._send(404, {"error": f"no route {route}"})
                return
            crop = "crop=0" not in query
            length = int(self.headers.get("Content-Length") or 0)
            if length <= 0:
                self._send(400, {"error": "empty body (expected one "
                                          ".nii/.nii.gz)"})
                return
            body = self.rfile.read(length)
            try:
                jobs = _decode_nifti_jobs(body, crop=crop, sequence=sequence)
            except Exception as exc:
                self._send(400, {"error": f"unreadable NIfTI: {exc}"})
                return
            try:
                labels, probs = batcher.predict([v for _, v in jobs])
            except Exception as exc:
                self._send(500, {"error": f"prediction failed: {exc}"})
                return
            self._send(200, {"rows": [
                {"timepoint": t, "prediction": label,
                 "probs": [float(v) for v in p]}
                for (t, _), label, p in zip(jobs, labels, probs)]})

        def log_message(self, fmt, *fmt_args):  # quiet request log
            pass

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog is 5; HTTP/1.1 clients open
        # a fresh connection per request, so a burst of concurrent clients
        # overflows the accept queue and the kernel RESETs the overflow
        # (measured: 16 barrier-synced clients in scripts/bench_http.py).
        # The whole point of this server is coalescing co-arriving
        # requests — size the backlog for bursts.
        request_queue_size = 128

    try:
        server = Server((host, port), Handler)
    except OSError:
        batcher.stop()                 # don't leak the dispatcher thread
        raise
    return server, batcher


def main(argv=None) -> None:
    """``python -m neurovit_tpu.serving_http``: online prediction server."""
    import argparse

    from neurovit_tpu.config import load_config

    parser = argparse.ArgumentParser(
        description="NeuroViT-TPU HTTP prediction server")
    parser.add_argument("--config", default=None)
    parser.add_argument("--checkpoint", default=None,
                        help="state-dict pickle / torch .pth "
                             "(default: BEST_MODEL_PATH)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="largest coalesced step (defaults match the "
                             "batch CLI: 128 for 3D, 2 for 4D)")
    parser.add_argument("--buckets", default=None,
                        help="comma-separated latency buckets below "
                             "--batch-size (default powers of two); '' "
                             "disables")
    parser.add_argument("--window", type=float, default=0.005,
                        help="micro-batch coalescing window in seconds: "
                             "how long a request waits for co-arriving "
                             "work before its step launches")
    parser.add_argument("--quant", default=None, choices=["int8"],
                        help="post-training int8 (block GEMMs on the int8 "
                             "MXU; BENCH.md 'int8 serving mode')")
    parser.add_argument("--host-bf16", action="store_true",
                        help="ship volumes to the device as bfloat16")
    parser.add_argument("--mesh", action="store_true",
                        help="serve over the config's device mesh (same "
                             "keys as the trainer / batch CLI): coalesced "
                             "steps shard over the data axis, TP/pipe "
                             "axes split the ViT block weights")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip precompiling every bucket at startup "
                             "(first requests then pay the compiles)")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    from neurovit_tpu.utils import compile_cache
    compile_cache.maybe_enable(config)
    predictor = predictor_from_cli_args(parser, args, config)
    if not args.no_warmup:
        print(f"Precompiling buckets {predictor.bucket_sizes} ...")
        predictor.warmup()
    server, batcher = make_server(predictor, host=args.host, port=args.port,
                                  window=args.window)
    print(f"Serving on http://{args.host}:{server.server_address[1]} "
          f"(buckets {predictor.bucket_sizes}, "
          f"window {args.window * 1e3:.1f} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.stop()


if __name__ == "__main__":
    main()

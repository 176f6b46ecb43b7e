"""Batched multi-stream serving daemon.

The production serving mode the reference implies but never builds
(SURVEY §2 'Parallelism': concurrency across streams is *implicit
batching* — every model takes a leading batch dim). Here it is explicit:
N concurrent client streams multiplex onto one fixed-slot StreamEngine;
every tick advances ALL active streams in a single jitted launch.

Protocol (multiprocessing.connection, length-prefixed pickle):

    ("open",  stream_id)             -> ("ok", stream_id, slot)
                                        | ("err", stream_id, reason)
    ("chunk", stream_id, float32[hop]) -> ("out", stream_id, float32[hop])
    ("close", stream_id)             -> ("ok", stream_id, -1)
    ("stats",)                       -> ("stats", metrics_summary_dict)

Chunks arriving within one tick window are batched; a stream with no
pending chunk simply isn't advanced (its slot state is preserved).
"""

import argparse
import queue
import threading
import time
from multiprocessing.connection import Listener
from typing import Dict, Tuple

import numpy as np

from audio_denoising_tpu.hub import load_pretrained
from audio_denoising_tpu.runtime.engine import StreamEngine
from audio_denoising_tpu.runtime.metrics import ServingMetrics


class EngineDaemon:
    def __init__(self, spec: str = "gruunet2-good", max_streams: int = 256,
                 address=("localhost", 6102), mode: str = "fast",
                 tick_ms: float = 1.0, multichip: bool = False):
        self.cfg, self.model, self.params = load_pretrained(spec)
        mesh = None
        if multichip:
            import jax
            if len(jax.devices()) > 1:
                from audio_denoising_tpu.parallel.mesh import make_mesh
                mesh = make_mesh()
        self.engine = StreamEngine(self.cfg, self.model, self.params,
                                   mode=mode, max_streams=max_streams,
                                   mesh=mesh)
        self.address = address
        self.tick_s = tick_ms / 1e3
        self.metrics = ServingMetrics()
        self._requests: "queue.Queue[Tuple[str, np.ndarray, object]]" = queue.Queue()
        self._lock = threading.Lock()   # engine lifecycle ops
        self._stop = threading.Event()

    # -- batching tick -----------------------------------------------------------
    def _tick_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._requests.get(timeout=0.1)
            except queue.Empty:
                continue
            pending = [first]
            deadline = time.perf_counter() + self.tick_s
            while time.perf_counter() < deadline:
                try:
                    pending.append(self._requests.get_nowait())
                except queue.Empty:
                    time.sleep(self.tick_s / 10)
            # group into rounds: one chunk per stream per engine launch
            while pending:
                batch: Dict[str, np.ndarray] = {}
                conns: Dict[str, object] = {}
                rest = []
                for sid, chunk, conn in pending:
                    if sid in batch:
                        rest.append((sid, chunk, conn))
                    else:
                        batch[sid] = chunk
                        conns[sid] = conn
                with self.metrics.timer("tick"):
                    with self._lock:
                        live = {sid: c for sid, c in batch.items()
                                if sid in self.engine.slots}
                        outs = self.engine.process(live) if live else {}
                for sid in batch:
                    conn = conns[sid]
                    lock = getattr(conn, "_adt_send_lock", None)
                    try:
                        with (lock or threading.Lock()):
                            if sid in outs:
                                conn.send(("out", sid, outs[sid]))
                            else:
                                conn.send(("err", sid, "unknown stream"))
                    except OSError:
                        pass
                self.metrics.count("chunks", len(batch))
                pending = rest

    # -- connections ---------------------------------------------------------
    def _handle(self, conn) -> None:
        owned = set()
        # Connection.send is not thread-safe; the tick thread replies on
        # the same connection, so every send goes through this lock.
        send_lock = threading.Lock()
        conn._adt_send_lock = send_lock
        try:
            while not self._stop.is_set():
                try:
                    msg = conn.recv()
                except (EOFError, OSError):
                    break
                op = msg[0]
                if op == "open":
                    sid = msg[1]
                    try:
                        with self._lock:
                            slot = self.engine.add_stream(sid)
                    except (RuntimeError, KeyError) as e:
                        with send_lock:
                            conn.send(("err", sid, str(e)))
                        continue
                    owned.add(sid)
                    with send_lock:
                        conn.send(("ok", sid, slot))
                elif op == "chunk":
                    sid, chunk = msg[1], np.asarray(msg[2], np.float32)
                    self._requests.put((sid, chunk, conn))
                elif op == "close":
                    sid = msg[1]
                    with self._lock:
                        if sid in self.engine.slots:
                            self.engine.remove_stream(sid)
                    owned.discard(sid)
                    with send_lock:
                        conn.send(("ok", sid, -1))
                elif op == "stats":
                    with send_lock:
                        conn.send(("stats", {
                            "active_streams": self.engine.active_streams,
                            **self.metrics.summary()}))
                else:
                    with send_lock:
                        conn.send(("err", None, f"unknown op {op!r}"))
        finally:
            with self._lock:
                for sid in owned:    # eviction on disconnect
                    if sid in self.engine.slots:
                        self.engine.remove_stream(sid)
            conn.close()

    def serve_forever(self) -> None:
        ticker = threading.Thread(target=self._tick_loop, daemon=True)
        ticker.start()
        while not self._stop.is_set():
            try:
                with Listener(self.address) as listener:
                    print(f"engine listening on {self.address} "
                          f"(max {self.engine.n} streams, hop "
                          f"{self.engine.hop})", flush=True)
                    while not self._stop.is_set():
                        conn = listener.accept()
                        threading.Thread(target=self._handle, args=(conn,),
                                         daemon=True).start()
            except KeyboardInterrupt:
                break
            except Exception as e:
                print(f"listener error: {e}; restarting...", flush=True)
                time.sleep(0.1)

    def stop(self) -> None:
        self._stop.set()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu engine",
        description="Batched multi-stream denoising daemon")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=6102)
    p.add_argument("--max-streams", type=int, default=256)
    p.add_argument("--mode", choices=["fast", "webrtc"], default="fast")
    p.add_argument("--tick-ms", type=float, default=1.0)
    p.add_argument("--multichip", action="store_true",
                   help="shard stream slots over all devices (1-D mesh)")
    args = p.parse_args(argv)
    EngineDaemon(args.model, args.max_streams, (args.host, args.port),
                 args.mode, args.tick_ms,
                 multichip=args.multichip).serve_forever()
    return 0

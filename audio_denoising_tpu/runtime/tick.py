"""Shared batching tick for the serving daemons.

One queue of (stream_id, chunk, sink) requests; each tick gathers a
window of requests, groups them into rounds of one-chunk-per-stream, and
advances every round's streams in a single engine launch. Used by both
the pickle-socket engine daemon and the WebSocket daemon (they previously
carried diverging copies of this loop).

The engine call is guarded: one malformed chunk must fail only its own
requests (sinks get the exception via err_sink), never the tick thread —
a dead tick thread would silently wedge every stream on the daemon.
"""

import queue
import threading
import time
from typing import Callable, Dict, Optional

import numpy as np


class BatchingTick:
    def __init__(self, engine, metrics, tick_s: float = 1e-3,
                 lock: Optional[threading.Lock] = None, depth: int = 2):
        self.engine = engine
        self.metrics = metrics
        self.tick_s = tick_s
        # dispatches kept in flight before delivery blocks: on
        # remote-attached chips each delivery pays the dispatch RTT, so
        # throughput scales with depth (at +depth*tick latency)
        self.depth = max(1, depth)
        self.lock = lock or threading.Lock()
        self.requests: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- client side -------------------------------------------------------
    def submit(self, sid: str, chunk: np.ndarray,
               sink: Callable[[np.ndarray], None],
               err_sink: Optional[Callable[[str], None]] = None) -> None:
        self.requests.put((sid, chunk, sink, err_sink))

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "BatchingTick":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    # -- delivery of in-flight device results -----------------------------------
    def _deliver(self, entry) -> None:
        out, slot_map, sinks, errs = entry
        try:
            # materialization is where ASYNC dispatch errors surface
            # (device disconnect/preemption) — they must fail only this
            # round's requests, never the tick thread
            out = np.asarray(out)       # blocks until the device is done
        except Exception as e:
            for sid in sinks:
                if errs[sid]:
                    errs[sid](f"engine error: {e!r}")
            return
        for sid, sink in sinks.items():
            if sid in slot_map:
                sink(out[slot_map[sid]])
            elif errs[sid]:
                errs[sid]("unknown stream")
        self.metrics.count("hops", len(slot_map))

    def _drain(self) -> None:
        while self._inflight:
            self._deliver(self._inflight.pop(0))

    def _flush_ready(self) -> None:
        """Deliver whatever the device has already finished, without
        blocking on dispatches still in the pipe."""
        while self._inflight:
            out = self._inflight[0][0]
            ready = getattr(out, "is_ready", None)
            if ready is not None and not ready():
                break
            self._deliver(self._inflight.pop(0))

    # -- the tick -------------------------------------------------------------
    def _loop(self) -> None:
        hop = self.engine.hop
        # Cadence-locked engines (unet mode) advance EVERY slot per engine
        # tick: draining duplicate-sid rounds back-to-back would splice
        # zero hops into streams whose chunk sits one round later in the
        # same window. For those engines run ONE round per wall tick and
        # carry the remainder into the next tick's batch.
        cadence = getattr(self.engine, "_cadence_locked", False)
        carry = []
        self._inflight = []
        while not self._stop.is_set():
            try:
                # with a carried round pending, wait only ~one tick for
                # fresh arrivals — blocking the usual 20-100 ms would
                # throttle request-response-paced clients to the poll rate
                first = self.requests.get(
                    timeout=self.tick_s if carry
                    else (0.02 if self._inflight else 0.1))
            except queue.Empty:
                if carry:
                    first = None
                else:
                    # idle: flush outstanding device results
                    self._drain()
                    continue
            pending = carry + ([first] if first is not None else [])
            carry = []
            deadline = time.perf_counter() + self.tick_s
            while time.perf_counter() < deadline:
                try:
                    pending.append(self.requests.get_nowait())
                except queue.Empty:
                    time.sleep(self.tick_s / 10)

            while pending:
                batch: Dict[str, np.ndarray] = {}
                sinks, errs, rest = {}, {}, []
                for sid, chunk, sink, err_sink in pending:
                    if sid in batch:
                        rest.append((sid, chunk, sink, err_sink))
                        continue
                    chunk = np.asarray(chunk)
                    if chunk.shape != (hop,) or not np.issubdtype(
                            chunk.dtype, np.floating):
                        if err_sink:
                            err_sink(f"bad chunk: expected float ({hop},), "
                                     f"got {chunk.dtype} {chunk.shape}")
                        continue
                    batch[sid] = chunk.astype(np.float32, copy=False)
                    sinks[sid] = sink
                    errs[sid] = err_sink

                if batch:
                    try:
                        with self.metrics.timer("tick"):
                            with self.lock:
                                live = {s: c for s, c in batch.items()
                                        if s in self.engine.slots}
                                if live:
                                    out, slot_map = \
                                        self.engine.process_async(live)
                                else:
                                    out, slot_map = None, {}
                        if out is not None:
                            # pipeline: dispatch now, materialize on a
                            # LATER tick — overlaps host batching and the
                            # device round trip (keep <=2 in flight).
                            # Start the d2h copy immediately so _deliver's
                            # np.asarray finds the bytes already en route
                            # instead of serializing the tick thread on a
                            # cold synchronous transfer (the d2h, not the
                            # compute, floors the materialized rate on
                            # relay-attached chips — docs/BENCHMARKS.md).
                            start_copy = getattr(out, "copy_to_host_async",
                                                 None)
                            if start_copy is not None:
                                try:
                                    start_copy()
                                except Exception:
                                    pass   # fall back to sync np.asarray
                            self._inflight.append(
                                (out, slot_map, sinks, errs))
                            while len(self._inflight) >= self.depth:
                                self._deliver(self._inflight.pop(0))
                        else:
                            for sid in batch:
                                if errs[sid]:
                                    errs[sid]("unknown stream")
                    except Exception as e:   # guard the tick thread
                        for sid in batch:
                            if errs[sid]:
                                errs[sid](f"engine error: {e!r}")
                if cadence and rest:
                    carry = rest             # next wall tick, next cycle hop
                    break
                pending = rest
            if not pending and not carry and self.requests.empty():
                self._flush_ready()

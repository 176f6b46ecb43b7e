"""WebSocket real-time denoising daemon — the browser-mic entry point
(replaces the reference's streamlit-webrtc UI, app2.py:479-492, with a
dependency-free server a web page can talk to directly).

Protocol per connection (one connection == one stream):

- client sends BINARY frames of int16 little-endian mono PCM at the
  model's sample rate, any chunk size (a host-side re-chunker carries
  residue to the engine hop size);
- server replies with BINARY int16 frames of denoised audio, same total
  length (hop-quantized; the residue flushes with the next chunk);
- TEXT frame "stats" returns a JSON stats message; close frame ends.

A plain HTTP ``GET /`` on the same port serves the browser mic client
(apps/static/index.html: getUserMedia -> AudioWorklet -> int16 PCM WS
frames -> denoised playback) — the end-to-end equivalent of the
reference's streamlit-webrtc flagship UX (app2.py:479-492): open the
page, grant mic, hear denoised audio.

All connections multiplex onto ONE batched StreamEngine: every tick
advances every active stream in a single jitted launch.
"""

import argparse
import json
import os
import queue
import socket
import threading
import time
import uuid

import numpy as np

from audio_denoising_tpu.hub import load_pretrained
from audio_denoising_tpu.io import websocket as ws
from audio_denoising_tpu.io.wavio import float32_to_pcm16, pcm_to_float32
from audio_denoising_tpu.runtime.engine import StreamEngine
from audio_denoising_tpu.runtime.metrics import ServingMetrics
from audio_denoising_tpu.runtime.tick import BatchingTick


class _PyChunker:
    """Residue-carry fallback when the native ring is unavailable."""

    def __init__(self, chunk_size: int):
        self.chunk_size = chunk_size
        self._buf = np.zeros(0, np.float32)

    def push(self, samples: np.ndarray) -> int:
        self._buf = np.concatenate([self._buf, samples])
        return len(self._buf) // self.chunk_size

    def pop(self):
        if len(self._buf) < self.chunk_size:
            return None
        out, self._buf = (self._buf[:self.chunk_size],
                          self._buf[self.chunk_size:])
        return out


def _make_chunker(hop: int):
    try:
        from audio_denoising_tpu.io.native import NativeChunker, native_available
        if native_available():
            return NativeChunker(hop)
    except Exception:
        pass
    return _PyChunker(hop)


_STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "static")


class WSDaemon:
    def __init__(self, spec: str = "gruunet2-good", host: str = "localhost",
                 port: int = 8765, max_streams: int = 256,
                 mode: str = "fast", tick_ms: float = 1.0,
                 pipeline_depth: int = 2, snr_gate_db: float = None,
                 snr_gate_width_db: float = None,
                 snr_gate_estimator: str = None, dtype: str = None,
                 auto_gate: bool = True, unet_seg_hops: int = None,
                 unet_ctx: int = None, unet_xfade: int = None,
                 unet_ctx_left: int = None):
        self.spec = spec
        self.cfg, self.model, self.params = load_pretrained(spec)
        from audio_denoising_tpu.config import (
            recommended_serving, recommended_streaming_geometry,
            with_snr_gate, with_unet_geometry)
        self.cfg = with_unet_geometry(self.cfg, unet_seg_hops, unet_ctx,
                                      unet_xfade, unet_ctx_left)
        if snr_gate_db is not None:
            self.cfg = with_snr_gate(self.cfg, snr_gate_db,
                                     snr_gate_width_db, snr_gate_estimator)
        elif auto_gate and mode in ("fast", "fused"):
            # no gate flags: serve the measured-best profile (the tuned
            # SNR gate on eligible causal checkpoints, VERDICT r4 #4);
            # --no-snr-gate serves the raw model. GL modes have no gated
            # reconstruction (recommended_serving is a no-op there via
            # the reconstruction check, but gate modes are listed
            # explicitly so a future mode defaults safe).
            self.cfg = recommended_serving(self.cfg)
        if (auto_gate and mode == "unet" and unet_seg_hops is None
                and unet_ctx is None and unet_xfade is None
                and unet_ctx_left is None):
            # zero geometry flags: the segment family serves the
            # measured-best bounded-latency window (84 ms at offline
            # SI-SDR parity, round-5 frontier); any explicit geometry
            # flag — or --no-snr-gate, the raw-profile switch — opts out
            self.cfg = recommended_streaming_geometry(self.cfg)
        if dtype is not None:
            import dataclasses
            self.cfg = dataclasses.replace(self.cfg, serving=dataclasses.replace(
                self.cfg.serving, dtype=dtype))
        self.engine = StreamEngine(self.cfg, self.model, self.params,
                                   mode=mode, max_streams=max_streams)
        self.addr = (host, port)
        self.hop = self.cfg.dsp.hop_length
        self.metrics = ServingMetrics()
        self._lock = threading.Lock()
        self.tick = BatchingTick(self.engine, self.metrics,
                                 tick_s=tick_ms / 1e3, lock=self._lock,
                                 depth=pipeline_depth)
        self._stop = threading.Event()
        self._srv: socket.socket = None

    # -- browser client page -------------------------------------------------
    def client_page(self) -> bytes:
        """The mic client HTML with this daemon's DSP params substituted."""
        with open(os.path.join(_STATIC_DIR, "index.html"), "rb") as f:
            page = f.read()
        return (page
                .replace(b"__SAMPLE_RATE__",
                         str(self.cfg.dsp.sample_rate).encode())
                .replace(b"__HOP__", str(self.hop).encode())
                .replace(b"__MODEL__", self.spec.encode()))

    def _serve_http(self, method, path, _headers, sock):
        """Plain-HTTP fallback on the WS port: GET / -> the mic client."""
        if method != "GET":
            sock.sendall(b"HTTP/1.1 405 Method Not Allowed\r\n"
                         b"Allow: GET\r\nContent-Length: 0\r\n\r\n")
            return
        if path.split("?")[0] not in ("/", "/index.html"):
            sock.sendall(b"HTTP/1.1 404 Not Found\r\n"
                         b"Content-Length: 0\r\n\r\n")
            return
        body = self.client_page()
        sock.sendall(b"HTTP/1.1 200 OK\r\n"
                     b"Content-Type: text/html; charset=utf-8\r\n"
                     b"Cache-Control: no-store\r\n"
                     b"Content-Length: " + str(len(body)).encode()
                     + b"\r\nConnection: close\r\n\r\n" + body)

    # -- per-connection ------------------------------------------------------
    def _handle(self, raw_conn: socket.socket):
        sid = uuid.uuid4().hex
        conn = raw_conn
        closed = threading.Event()   # terminates the sender thread
        try:
            hs = ws.handshake(raw_conn, http_handler=self._serve_http)
            if hs is None:
                return
            _path, leftover = hs
            conn = ws.Buffered(raw_conn, leftover)
            try:
                with self._lock:
                    self.engine.add_stream(sid)
            except RuntimeError as e:          # engine full
                ws.send_frame(conn, json.dumps(
                    {"error": str(e)}).encode(), ws.OP_TEXT)
                # close code 1013 "try again later"
                ws.send_frame(conn, b"\x03\xf5busy", ws.OP_CLOSE)
                return
            # bounded: a client that streams in but stops reading would
            # otherwise grow this without limit (TCP backpressure blocks
            # the sender); drop-oldest matches degrade-to-passthrough
            out_q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=64)

            def sink(hop_out: np.ndarray):
                while True:
                    try:
                        out_q.put_nowait(hop_out)
                        return
                    except queue.Full:
                        try:
                            out_q.get_nowait()   # drop oldest
                        except queue.Empty:
                            pass

            def sender():
                while not (self._stop.is_set() or closed.is_set()):
                    try:
                        out = out_q.get(timeout=0.25)
                    except queue.Empty:
                        continue
                    try:
                        ws.send_frame(conn, float32_to_pcm16(out).tobytes())
                    except OSError:
                        return

            threading.Thread(target=sender, daemon=True).start()
            chunker = _make_chunker(self.hop)
            while not self._stop.is_set():
                op, payload = ws.recv_message(conn)
                if op == ws.OP_CLOSE:
                    break
                if op == ws.OP_TEXT:
                    if payload.strip() == b"stats":
                        ws.send_frame(conn, json.dumps({
                            "active_streams": self.engine.active_streams,
                            "algorithmic_latency_ms": round(
                                self.engine.algorithmic_latency_ms, 3),
                            **self.metrics.summary()}).encode(), ws.OP_TEXT)
                    continue
                # tolerate odd-length frames (truncated int16 sample)
                payload = payload[:len(payload) & ~1]
                if not payload:
                    continue
                pcm = np.frombuffer(payload, np.int16)
                chunker.push(pcm_to_float32(pcm))
                while (c := chunker.pop()) is not None:
                    self.tick.submit(sid, c, sink)
        except (ConnectionError, OSError):
            pass
        finally:
            closed.set()                   # terminate the sender thread
            with self._lock:
                if sid in self.engine.slots:
                    self.engine.remove_stream(sid)
            try:
                conn.close()
            except OSError:
                pass

    def serve_forever(self):
        self.tick.start()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(self.addr)
        srv.listen(64)
        srv.settimeout(0.5)
        self._srv = srv
        print(f"websocket denoiser on ws://{self.addr[0]}:{self.addr[1]} "
              f"(hop {self.hop} @ {self.cfg.dsp.sample_rate} Hz, "
              f"max {self.engine.n} streams)", flush=True)
        try:
            while not self._stop.is_set():
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    continue
                threading.Thread(target=self._handle, args=(conn,),
                                 daemon=True).start()
        finally:
            srv.close()

    def stop(self):
        self._stop.set()
        self.tick.stop()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="audio_denoising_tpu ws")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--max-streams", type=int, default=256)
    p.add_argument("--mode",
                   choices=["fast", "webrtc", "fused", "fused-webrtc",
                            "unet"],
                   default="fast")
    p.add_argument("--pipeline-depth", type=int, default=2)
    p.add_argument("--snr-gate", type=float, default=None,
                   help="SNR-gated passthrough blend (dB) — protects "
                        "near-clean streams. When absent, eligible causal "
                        "checkpoints serve the TUNED gate by default "
                        "(config.recommended_serving)")
    p.add_argument("--no-snr-gate", action="store_true",
                   help="serve the raw profile: disable the recommended "
                        "defaults (tuned gate on causal checkpoints; "
                        "tuned streaming geometry in mode 'unet')")
    p.add_argument("--snr-gate-width", type=float, default=None,
                   help="gate transition width in dB (tuned default 6)")
    p.add_argument("--snr-gate-estimator", default=None,
                   choices=("removed", "floor", "both"),
                   help="gate SNR estimator (default 'both': model-"
                        "informed decision + floor-tracker veto; "
                        "ops/noisefloor.py)")
    p.add_argument("--dtype", choices=["float32", "bfloat16", "int8"],
                   default=None,
                   help="serving compute dtype override (int8 = W8A8 "
                        "quantized plan, mode 'fast')")
    p.add_argument("--unet-seg-hops", type=int, default=None,
                   help="mode 'unet': segment length in hops (latency = "
                        "seg_hops*hop + ctx samples)")
    p.add_argument("--unet-ctx", type=int, default=None,
                   help="mode 'unet': FUTURE window context in samples")
    p.add_argument("--unet-xfade", type=int, default=None,
                   help="mode 'unet': segment-join crossfade in samples "
                        "(latency-free)")
    p.add_argument("--unet-ctx-left", type=int, default=None,
                   help="mode 'unet': PAST window context in samples "
                        "(latency-free)")
    args = p.parse_args(argv)
    WSDaemon(args.model, args.host, args.port, args.max_streams,
             args.mode, pipeline_depth=args.pipeline_depth,
             snr_gate_db=args.snr_gate,
             snr_gate_width_db=args.snr_gate_width,
             snr_gate_estimator=args.snr_gate_estimator,
             dtype=args.dtype,
             auto_gate=not args.no_snr_gate,
             unet_seg_hops=args.unet_seg_hops,
             unet_ctx=args.unet_ctx,
             unet_xfade=args.unet_xfade,
             unet_ctx_left=args.unet_ctx_left).serve_forever()
    return 0

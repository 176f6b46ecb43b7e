"""Wire-compatible socket denoising daemon.

Speaks the reference's protocol exactly (server.py:178-227): a
``multiprocessing.connection.Listener`` on ``('localhost', 6101)``, each
message a pickled float ndarray of shape ``(n_samples, n_channels)``,
replied to with the denoised array of the same shape; the string
``'close'`` ends a connection.

Improvements over the reference, behind the same wire format:

- per-connection hidden state (the reference shares ONE global ``hx``
  across all connections — a cross-client state leak, server.py:177,212);
  ``--shared-state`` restores the legacy behavior.
- concurrent connections (reference accepts one at a time);
- the crash-restart wrapper is kept (server.py:221-227) but per-connection
  failures are isolated.
"""

import argparse
import socket
import threading
import time
from multiprocessing.connection import Listener

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.hub import load_pretrained
from audio_denoising_tpu.pipeline import make_server_step
from audio_denoising_tpu.runtime.metrics import ServingMetrics


class SocketDaemon:
    def __init__(self, spec: str = "gruunet2-good",
                 address=("localhost", 6101), shared_state: bool = False,
                 snr_gate_db: float = None, snr_gate_width_db: float = None,
                 snr_gate_estimator: str = None, auto_gate: bool = True):
        self.cfg, self.model, self.params = load_pretrained(spec)
        from audio_denoising_tpu.config import (recommended_serving,
                                                with_snr_gate)
        if snr_gate_db is not None:
            self.cfg = with_snr_gate(self.cfg, snr_gate_db,
                                     snr_gate_width_db, snr_gate_estimator)
        elif auto_gate:
            # zero-flag = the measured-best profile, same rule as the
            # engine/ws/offline surfaces (VERDICT r4 #4). For the default
            # reference model this is a no-op (output_gain 3 makes it
            # ineligible), so reference wire parity is untouched; a
            # framework-trained causal flagship served over this protocol
            # gets the tuned gate. --no-snr-gate serves the raw model.
            self.cfg = recommended_serving(self.cfg)
        self.address = address
        self.shared_state = shared_state
        self._step = jax.jit(make_server_step(self.cfg, self.model))
        self._shared_hx = None
        self._lock = threading.Lock()
        self.metrics = ServingMetrics()
        self._stop = threading.Event()

    # -- processing ----------------------------------------------------------
    def process(self, x: np.ndarray, hx):
        """x: (n_samples, n_channels) -> (denoised same shape, hx')."""
        x = np.asarray(x, np.float32).T          # (C, n)
        n_channels = x.shape[0] if x.ndim == 2 else 1
        mono = x[0] if x.ndim == 2 else x        # monotize (server.py:205)
        with self.metrics.timer("step"):
            hx, y = self._step(self.params, hx, jnp.asarray(mono[None]))
            y = np.asarray(y[0])
        out = np.repeat(y[None], n_channels, axis=0)  # (C, n)
        return out.T, hx

    # -- connection handling ---------------------------------------------------
    def _handle(self, conn) -> None:
        hx = self.model.init_state(1)
        try:
            while not self._stop.is_set():
                try:
                    msg = conn.recv()
                except (EOFError, OSError):
                    break
                if isinstance(msg, str) and msg == "close":
                    break
                # malformed payload (non-array pickle, wrong dtype/shape):
                # isolation means a clean error reply + close of THIS
                # connection, not a dead handler thread (the reference at
                # least restarts its listener on any error,
                # server.py:221-227; other connections here are unaffected)
                try:
                    arr = np.asarray(msg, np.float32)
                    if arr.ndim not in (1, 2) or arr.size == 0:
                        raise ValueError(
                            f"expected a non-empty (n_samples, n_channels) "
                            f"float array, got shape {arr.shape}")
                except (TypeError, ValueError) as e:
                    self.metrics.count("malformed")
                    try:
                        conn.send(f"error: malformed payload ({e})")
                    except (OSError, BrokenPipeError):
                        pass
                    break
                if self.shared_state:
                    with self._lock:
                        out, self._shared_hx = self.process(
                            arr, self._shared_hx if self._shared_hx
                            is not None else hx)
                else:
                    out, hx = self.process(arr, hx)
                conn.send(out)
                self.metrics.count("messages")
        finally:
            conn.close()

    def serve_forever(self) -> None:
        while not self._stop.is_set():
            try:
                with Listener(self.address) as listener:
                    # accept() has no timeout param; set it on the socket
                    # so stop() takes effect (reference does the same,
                    # server.py:184)
                    listener._listener._socket.settimeout(0.5)
                    print(f"listening on {self.address} ...", flush=True)
                    while not self._stop.is_set():
                        try:
                            conn = listener.accept()
                        except socket.timeout:
                            continue
                        t = threading.Thread(target=self._handle,
                                             args=(conn,), daemon=True)
                        t.start()
            except KeyboardInterrupt:
                break
            except Exception as e:  # crash-restart (server.py:221-227)
                print(f"listener error: {e}; restarting...", flush=True)
                time.sleep(0.1)

    def stop(self) -> None:
        self._stop.set()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu serve",
        description="Reference-protocol socket denoising daemon")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=6101)
    p.add_argument("--shared-state", action="store_true",
                   help="legacy: one hx shared across connections")
    p.add_argument("--snr-gate", type=float, default=None,
                   help="SNR-gated passthrough blend (dB); absent = "
                        "eligible causal checkpoints serve the TUNED "
                        "gate (config.recommended_serving)")
    p.add_argument("--no-snr-gate", action="store_true",
                   help="serve the raw model: disable the recommended-"
                        "profile gate")
    p.add_argument("--snr-gate-width", type=float, default=None)
    p.add_argument("--snr-gate-estimator", default=None,
                   choices=("removed", "floor", "both"))
    args = p.parse_args(argv)
    daemon = SocketDaemon(args.model, (args.host, args.port),
                          shared_state=args.shared_state,
                          snr_gate_db=args.snr_gate,
                          snr_gate_width_db=args.snr_gate_width,
                          snr_gate_estimator=args.snr_gate_estimator,
                          auto_gate=not args.no_snr_gate)
    daemon.serve_forever()
    return 0

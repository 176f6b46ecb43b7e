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
                 address=("localhost", 6101), shared_state: bool = False):
        self.cfg, self.model, self.params = load_pretrained(spec)
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
    args = p.parse_args(argv)
    daemon = SocketDaemon(args.model, (args.host, args.port),
                          shared_state=args.shared_state)
    daemon.serve_forever()
    return 0

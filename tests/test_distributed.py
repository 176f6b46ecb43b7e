"""Two-process jax.distributed smoke test for parallel/distributed.py.

The multi-host init path can't run in-process (one distributed runtime per
process), so this spawns a localhost coordinator pair on the CPU backend —
the standard way to exercise the DCN code path on a single machine. Each
worker gets 2 virtual devices; the pair forms a 4-device global mesh and
runs one cross-process reduction (tests/_dist_worker.py).
"""

import os
import pathlib
import socket
import subprocess
import sys

_WORKER = pathlib.Path(__file__).with_name("_dist_worker.py")
_REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_smoke():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins its own backend/flags before importing jax
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), coord, str(pid)],
            cwd=str(_REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST-OK pid={pid} sum=28.0" in out, out

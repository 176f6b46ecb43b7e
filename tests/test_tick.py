"""BatchingTick unit behavior against a recording fake engine — notably
the cadence-locked carry rule: a cadence-locked engine (unet mode) must
see at most ONE engine tick per wall tick, with duplicate-sid remainders
carried into the NEXT tick instead of drained as an immediate extra round
(which would splice zero hops into every on-time stream's segment)."""

import threading
import time

import numpy as np

from audio_denoising_tpu.runtime.metrics import ServingMetrics
from audio_denoising_tpu.runtime.tick import BatchingTick


class _FakeEngine:
    def __init__(self, hop=4, cadence=False):
        self.hop = hop
        self._cadence_locked = cadence
        self.slots = {"a": 0, "b": 1}
        self.calls = []          # list of sets of sids per engine tick
        self._lock = threading.Lock()

    def process_async(self, chunks):
        with self._lock:
            self.calls.append(set(chunks))
        out = np.zeros((2, self.hop), np.float32)
        return out, {s: self.slots[s] for s in chunks}


def _run_tick(engine, submits, settle=0.5):
    """Submit everything BEFORE starting the tick thread so the first
    window deterministically sees all requests (submitting after start
    races the 5 ms tick under machine load)."""
    tick = BatchingTick(engine, ServingMetrics(), tick_s=5e-3)
    got = []
    for sid, chunk in submits:
        tick.submit(sid, chunk, lambda o: got.append(o))
    tick.start()
    time.sleep(settle)
    tick.stop()
    return got


def test_masked_engine_drains_duplicates_same_window():
    """Default engines (masked commits) may run back-to-back rounds."""
    eng = _FakeEngine(cadence=False)
    c = np.zeros(4, np.float32)
    _run_tick(eng, [("a", c), ("a", c), ("b", c)])
    assert sum(len(s) for s in eng.calls) == 3
    assert set.union(*eng.calls) == {"a", "b"}


def test_cadence_engine_one_round_per_tick():
    """Cadence-locked engines: the duplicate 'a' chunk must arrive in a
    LATER engine tick, and no engine tick may be missing an available
    stream's chunk while that chunk waits in the same window."""
    eng = _FakeEngine(cadence=True)
    c = np.zeros(4, np.float32)
    got = _run_tick(eng, [("a", c), ("a", c), ("b", c)])
    assert sum(len(s) for s in eng.calls) == 3
    assert len(eng.calls) == 2, eng.calls
    assert eng.calls[0] == {"a", "b"}      # both on-time chunks together
    assert eng.calls[1] == {"a"}           # the duplicate, next tick
    assert len(got) == 3                   # every chunk still answered

"""Network-impairment behavior of the streaming path (round 5, VERDICT
r4 #6).

The browser path is WS-over-TCP, not WebRTC (decision memo:
docs/ARCHITECTURE.md §9). The property that makes that acceptable is
locked here: the engine is ARRIVAL-JITTER-INVARIANT. Masked commit
(runtime/engine.py StreamEngine.process) means a stream's recurrent
state advances only when its audio arrives, so delivery timing — gaps,
bursts, stalls — cannot change the audio; other streams on the same
engine are untouched; and a stalled stream recovers instantly because
there is no corrupted state to recover FROM. The reference's aiortc
transport (app2.py:479-492) conceals losses instead; ours makes them
semantically impossible to hear as state damage.

Engine-level locks are bit-exact; the WS-daemon locks drive real
sockets through the BatchingTick (duplicate-sid remainder carry,
underrun isolation, recovery after a stall).
"""

import json
import threading
import time

import numpy as np
import pytest

from audio_denoising_tpu.io import websocket as ws
from tests.test_websocket import _client_connect, _client_send

PORT = 28791


def _tiny_engine(max_streams=4):
    import jax
    from audio_denoising_tpu.config import (
        Config, DSPConfig, ModelConfig, ServingConfig)
    from audio_denoising_tpu.models import build_model
    from audio_denoising_tpu.runtime.engine import StreamEngine
    cfg = Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=256, hop_length=128,
                      n_mels=32, domain="mel", reconstruction="phase"),
        model=ModelConfig(arch="GRUUNet2", hidden_sizes=(6, 6, 6),
                          kernel_sizes=(3, 3, 3), strides=(2, 2, 2),
                          paddings=(1, 1, 1), num_compressed_bins=4),
        serving=ServingConfig(chunk_samples=128, max_streams=max_streams),
    )
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    params = model.init(jax.random.PRNGKey(0))
    return StreamEngine(cfg, model, params, mode="fast",
                        max_streams=max_streams)


class TestEngineJitterInvariance:
    def test_gaps_cannot_change_audio(self):
        """The same 8 frames produce BIT-IDENTICAL output whether they
        arrive on consecutive ticks or interleaved with 2-3 underrun
        ticks each — the core TCP-jitter-tolerance property."""
        rng = np.random.default_rng(3)
        frames = rng.standard_normal((8, 128)).astype(np.float32) * 0.2

        eng = _tiny_engine()
        eng.add_stream("steady")
        steady = [eng.process({"steady": f})["steady"] for f in frames]

        eng2 = _tiny_engine()
        eng2.add_stream("jittery")
        eng2.add_stream("other")        # keeps ticks running during gaps
        jittery = []
        other = rng.standard_normal((64, 128)).astype(np.float32) * 0.2
        oi = 0
        for k, f in enumerate(frames):
            for _ in range(k % 3):      # 0-2 underrun ticks before each
                eng2.process({"other": other[oi]})
                oi += 1
            jittery.append(eng2.process(
                {"jittery": f, "other": other[oi]})["jittery"])
            oi += 1
        np.testing.assert_array_equal(np.stack(steady),
                                      np.stack(jittery))

    def test_underrun_isolation(self):
        """A stream stalling must not perturb a co-scheduled stream:
        stream A's outputs with B stalled mid-run equal A running with B
        never present."""
        rng = np.random.default_rng(4)
        a_frames = rng.standard_normal((10, 128)).astype(np.float32) * 0.2
        b_frames = rng.standard_normal((10, 128)).astype(np.float32) * 0.2

        eng = _tiny_engine()
        eng.add_stream("a")
        alone = [eng.process({"a": f})["a"] for f in a_frames]

        eng2 = _tiny_engine()
        eng2.add_stream("a")
        eng2.add_stream("b")
        together = []
        for k, f in enumerate(a_frames):
            feed = {"a": f}
            if k < 3 or k >= 7:         # b stalls for ticks 3..6
                feed["b"] = b_frames[k]
            together.append(eng2.process(feed)["a"])
        np.testing.assert_array_equal(np.stack(alone), np.stack(together))


@pytest.fixture(scope="module")
def daemon():
    from audio_denoising_tpu.apps.ws_serve import WSDaemon
    d = WSDaemon("gruunet2-good", "localhost", PORT, max_streams=4,
                 tick_ms=0.5)
    t = threading.Thread(target=d.serve_forever, daemon=True)
    t.start()
    time.sleep(0.5)
    yield d
    d.stop()


def _stream_frames(sock, frames, hop, pause_after=(), pause_s=0.0):
    """Send int16 frames, optionally pausing after given indices; then
    collect exactly len(frames) output hops."""
    for k, fr in enumerate(frames):
        _client_send(sock, fr.tobytes())
        if k in pause_after:
            time.sleep(pause_s)
    want = len(frames) * hop * 2
    got = b""
    sock.settimeout(30)
    deadline = time.time() + 30
    while len(got) < want and time.time() < deadline:
        _fin, op, payload = ws.recv_frame(sock)
        if op == ws.OP_BINARY:
            got += payload
    return np.frombuffer(got, "<i2")


class TestWSImpairment:
    def _frames(self, daemon, n, seed):
        rng = np.random.default_rng(seed)
        f32 = np.clip(0.1 * rng.standard_normal((n, daemon.hop)), -1, 1)
        return np.round(f32 * 32767).astype("<i2")

    def test_burst_equals_paced(self, daemon):
        """All frames in one burst (a TCP segment flushing after a
        retransmit delay) vs the same frames paced: identical output.
        Exercises the BatchingTick duplicate-sid remainder carry — a
        burst must never splice or reorder hops."""
        hop = daemon.hop
        frames = self._frames(daemon, 6, seed=11)

        s1 = _client_connect(("localhost", PORT))
        try:
            paced = _stream_frames(s1, frames, hop,
                                   pause_after=tuple(range(6)),
                                   pause_s=0.01)
        finally:
            s1.close()

        s2 = _client_connect(("localhost", PORT))
        try:
            burst = _stream_frames(s2, frames, hop)
        finally:
            s2.close()

        assert paced.shape == burst.shape == (6 * hop,)
        np.testing.assert_array_equal(paced, burst)

    def test_stall_recovery_and_isolation(self, daemon):
        """Client B stalls 300 ms mid-stream while client A streams
        steadily: A's output equals A running alone (isolation), and B
        still receives every one of its hops (recovery)."""
        hop = daemon.hop
        a_frames = self._frames(daemon, 8, seed=21)
        b_frames = self._frames(daemon, 8, seed=22)

        sa = _client_connect(("localhost", PORT))
        try:
            a_alone = _stream_frames(sa, a_frames, hop)
        finally:
            sa.close()

        sa = _client_connect(("localhost", PORT))
        sb = _client_connect(("localhost", PORT))
        try:
            out_b = {}

            def drive_b():
                out_b["x"] = _stream_frames(sb, b_frames, hop,
                                            pause_after=(3,), pause_s=0.3)

            tb = threading.Thread(target=drive_b)
            tb.start()
            a_with_b = _stream_frames(sa, a_frames, hop,
                                      pause_after=tuple(range(8)),
                                      pause_s=0.02)
            tb.join(timeout=30)
        finally:
            sa.close()
            sb.close()

        assert a_with_b.shape == (8 * hop,)
        np.testing.assert_array_equal(a_alone, a_with_b)
        assert out_b["x"].shape == (8 * hop,)   # B recovered every hop

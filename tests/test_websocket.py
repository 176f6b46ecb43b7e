"""WebSocket daemon end-to-end: a masked client (browser behavior) pushes
int16 PCM, receives denoised int16 PCM; protocol units round-trip."""

import base64
import hashlib
import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from audio_denoising_tpu.io import websocket as ws


def _client_send(sock, payload: bytes, opcode=ws.OP_BINARY):
    """Client frames MUST be masked (RFC 6455 §5.1)."""
    mask = os.urandom(4)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    n = len(payload)
    head = bytes([0x80 | opcode])
    if n < 126:
        head += bytes([0x80 | n])
    elif n < (1 << 16):
        head += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        head += bytes([0x80 | 127]) + struct.pack(">Q", n)
    sock.sendall(head + mask + masked)


def _client_connect(addr):
    sock = socket.create_connection(addr, timeout=5)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((f"GET /stream HTTP/1.1\r\nHost: {addr[0]}\r\n"
                  "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    head, leftover = resp.split(b"\r\n\r\n", 1)
    assert b"101" in head.split(b"\r\n", 1)[0]
    accept = base64.b64encode(hashlib.sha1(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode())
        .digest()).decode()
    assert accept.encode() in head
    # frames the server pipelined behind the 101 must not be swallowed
    return ws.Buffered(sock, leftover)


class TestProtocolUnits:
    def test_frame_round_trip_sizes(self):
        a, b = socket.socketpair()
        try:
            for size in (0, 1, 125, 126, 65535, 65536):
                payload = os.urandom(size)
                _client_send(b, payload)
                fin, op, got = ws.recv_frame(a)
                assert fin and op == ws.OP_BINARY and got == payload
        finally:
            a.close()
            b.close()

    def test_server_frame_unmasked(self):
        a, b = socket.socketpair()
        try:
            ws.send_frame(a, b"hello", ws.OP_TEXT)
            data = b.recv(16)
            assert data[0] == 0x80 | ws.OP_TEXT
            assert not (data[1] & 0x80)        # no mask bit
            assert data[2:7] == b"hello"
        finally:
            a.close()
            b.close()

    def test_ping_answered_within_recv_message(self):
        a, b = socket.socketpair()
        try:
            _client_send(b, b"p", ws.OP_PING)
            _client_send(b, b"data", ws.OP_BINARY)
            op, payload = ws.recv_message(a)
            assert op == ws.OP_BINARY and payload == b"data"
            fin, op2, pong = ws.recv_frame(b)   # server answered the ping
            assert op2 == ws.OP_PONG and pong == b"p"
        finally:
            a.close()
            b.close()

    def test_fragmented_message(self):
        a, b = socket.socketpair()
        try:
            # two fragments: TEXT(fin=0) + CONT(fin=1), masked
            for fin, op, part in ((0, ws.OP_TEXT, b"he"),
                                  (1, ws.OP_CONT, b"llo")):
                mask = os.urandom(4)
                masked = bytes(c ^ mask[i % 4]
                               for i, c in enumerate(part))
                b.sendall(bytes([(0x80 if fin else 0) | op,
                                 0x80 | len(part)]) + mask + masked)
            op, payload = ws.recv_message(a)
            assert op == ws.OP_TEXT and payload == b"hello"
        finally:
            a.close()
            b.close()


class TestWSDaemon:
    @pytest.fixture(scope="class")
    def daemon(self):
        from audio_denoising_tpu.apps.ws_serve import WSDaemon
        d = WSDaemon("gruunet2-good", "localhost", 28765, max_streams=4,
                     tick_ms=0.5)
        t = threading.Thread(target=d.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        yield d
        d.stop()

    def test_denoise_round_trip(self, daemon):
        hop = daemon.hop
        sock = _client_connect(("localhost", 28765))
        try:
            rng = np.random.default_rng(0)
            pcm = (np.clip(0.1 * rng.standard_normal(hop * 4), -1, 1)
                   * 32767).astype(np.int16)
            # send in odd-sized pieces to exercise the re-chunker
            _client_send(sock, pcm[:1000].tobytes())
            _client_send(sock, pcm[1000:].tobytes())
            got = b""
            sock.settimeout(30)
            while len(got) < hop * 4 * 2:
                fin, op, payload = ws.recv_frame(sock)
                assert op == ws.OP_BINARY
                got += payload
            out = np.frombuffer(got, np.int16)
            assert out.shape == (hop * 4,)
        finally:
            sock.close()

    def test_stats_and_eviction(self, daemon):
        sock = _client_connect(("localhost", 28765))
        try:
            _client_send(sock, b"stats", ws.OP_TEXT)
            fin, op, payload = ws.recv_frame(sock)
            assert op == ws.OP_TEXT
            import json
            stats = json.loads(payload)
            assert stats["active_streams"] >= 1
        finally:
            sock.close()
        time.sleep(0.5)
        assert daemon.engine.active_streams == 0


class TestWSChurnSoak:
    """Round 4 (VERDICT r3 #5): ws daemon under connection churn —
    clients connect, stream, and vanish (some abruptly) while a
    persistent client keeps streaming; the daemon must stay alive, keep
    serving, and leak no slots."""

    def test_connection_churn_no_slot_leak(self):
        import json
        from audio_denoising_tpu.apps.ws_serve import WSDaemon
        d = WSDaemon("gruunet2-good", "localhost", 28769, max_streams=4,
                     tick_ms=0.5)
        t = threading.Thread(target=d.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        hop = d.hop
        rng = np.random.default_rng(3)
        try:
            persistent = _client_connect(("localhost", 28769))
            persistent.settimeout(30)
            for round_i in range(15):
                # churner: connect, stream 2 hops, then half the time
                # close abruptly (no close frame) — the daemon must reap
                s = _client_connect(("localhost", 28769))
                pcm = (np.clip(0.1 * rng.standard_normal(hop * 2), -1, 1)
                       * 32767).astype(np.int16)
                _client_send(s, pcm.tobytes())
                if round_i % 2 == 0:
                    s.settimeout(30)
                    got = b""
                    while len(got) < hop * 2 * 2:
                        _fin, op, payload = ws.recv_frame(s)
                        if op == ws.OP_BINARY:
                            got += payload
                s.close()                      # abrupt for odd rounds
                # the persistent stream keeps flowing through the churn
                pcm = (np.clip(0.1 * rng.standard_normal(hop), -1, 1)
                       * 32767).astype(np.int16)
                _client_send(persistent, pcm.tobytes())
                got = b""
                while len(got) < hop * 2:
                    _fin, op, payload = ws.recv_frame(persistent)
                    if op == ws.OP_BINARY:
                        got += payload
            # only the persistent stream may remain
            _client_send(persistent, b"stats", ws.OP_TEXT)
            while True:
                _fin, op, payload = ws.recv_frame(persistent)
                if op == ws.OP_TEXT:
                    break
            stats = json.loads(payload)
            assert stats["active_streams"] <= 2   # persistent + 1 in reap
            persistent.close()
            time.sleep(1.0)
            assert d.engine.active_streams == 0   # no slot leak
        finally:
            d.stop()


class TestPipelinedFirstFrame:
    def test_frame_behind_handshake_not_lost(self, ):
        """Regression: a client coalescing the upgrade request and its
        first audio frame into one TCP segment must not lose the frame."""
        import socket as socketlib
        import threading as th
        from audio_denoising_tpu.apps.ws_serve import WSDaemon
        daemon = WSDaemon("gruunet2-good", "localhost", 28766,
                          max_streams=2, tick_ms=0.5)
        t = th.Thread(target=daemon.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        try:
            hop = daemon.hop
            key = base64.b64encode(os.urandom(16)).decode()
            req = (f"GET /s HTTP/1.1\r\nHost: x\r\n"
                   "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                   f"Sec-WebSocket-Key: {key}\r\n"
                   "Sec-WebSocket-Version: 13\r\n\r\n").encode()
            pcm = np.zeros(hop, np.int16).tobytes()
            mask = os.urandom(4)
            masked = bytes(c ^ mask[i % 4] for i, c in enumerate(pcm))
            frame = (bytes([0x80 | ws.OP_BINARY, 0x80 | 126])
                     + struct.pack(">H", len(pcm)) + mask + masked)
            sock = socket.create_connection(("localhost", 28766), timeout=5)
            sock.sendall(req + frame)        # ONE segment: pipelined frame
            resp = b""
            while b"\r\n\r\n" not in resp:
                resp += sock.recv(4096)
            assert b"101" in resp.split(b"\r\n", 1)[0]
            sock.settimeout(30)
            fin, op, payload = ws.recv_frame(sock)
            assert op == ws.OP_BINARY and len(payload) == hop * 2
            sock.close()
        finally:
            daemon.stop()


class TestEngineFull:
    def test_engine_full_signaled(self):
        """Regression: 3rd client on a 2-slot engine gets an error + close
        frame instead of a silent drop."""
        import threading as th
        from audio_denoising_tpu.apps.ws_serve import WSDaemon
        daemon = WSDaemon("gruunet2-good", "localhost", 28767,
                          max_streams=2, tick_ms=0.5)
        t = th.Thread(target=daemon.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        socks = []
        try:
            for _ in range(2):
                socks.append(_client_connect(("localhost", 28767)))
            deadline = time.time() + 10
            while daemon.engine.active_streams < 2 and time.time() < deadline:
                time.sleep(0.05)
            assert daemon.engine.active_streams == 2
            extra = _client_connect(("localhost", 28767))
            extra.settimeout(10)
            fin, op, payload = ws.recv_frame(extra)
            assert op == ws.OP_TEXT and b"error" in payload
            fin, op, payload = ws.recv_frame(extra)
            assert op == ws.OP_CLOSE
            extra.close()
        finally:
            for s in socks:
                s.close()
            daemon.stop()

"""Browser mic client end-to-end: the WS daemon serves the client page on
plain HTTP GET, and the page's exact wire behavior (one hop of int16-LE
mono PCM per binary frame, 1 Hz "stats" text frames) round-trips through
the daemon — the framework equivalent of the reference's streamlit-webrtc
flagship UX (reference app2.py:479-492)."""

import json
import socket
import threading
import time

import numpy as np
import pytest

from audio_denoising_tpu.io import websocket as ws
from tests.test_websocket import _client_connect, _client_send

PORT = 28768


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


def _http_get(path, port=PORT, method="GET"):
    sock = socket.create_connection(("localhost", port), timeout=10)
    try:
        sock.sendall(f"{method} {path} HTTP/1.1\r\nHost: localhost\r\n"
                     "Accept: text/html\r\n\r\n".encode())
        sock.settimeout(10)
        data = b""
        while b"\r\n\r\n" not in data:
            part = sock.recv(65536)
            if not part:
                return data, b""
            data += part
        head, body = data.split(b"\r\n\r\n", 1)
        want = None
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                want = int(line.split(b":", 1)[1])
        while want is not None and len(body) < want:
            part = sock.recv(65536)
            if not part:
                break
            body += part
        return head, body
    finally:
        sock.close()


class TestClientPage:
    def test_get_root_serves_substituted_page(self, daemon):
        head, body = _http_get("/")
        assert head.split(b"\r\n")[0] == b"HTTP/1.1 200 OK"
        assert b"text/html" in head
        page = body.decode()
        # placeholders substituted with this daemon's real DSP params
        assert "__SAMPLE_RATE__" not in page and "__HOP__" not in page
        assert f"const SR = {daemon.cfg.dsp.sample_rate};" in page
        assert f"const HOP = {daemon.hop};" in page
        assert "gruunet2-good" in page

    def test_page_has_full_mic_chain(self, daemon):
        _head, body = _http_get("/index.html")
        page = body.decode()
        # the capability chain the VERDICT demanded: mic capture ->
        # worklet framing -> int16 WS frames -> playback + stats readout
        for needle in ("getUserMedia", "audioWorklet.addModule",
                       "capture-processor", "playback-processor",
                       "registerProcessor", "Int16Array", "new WebSocket",
                       'send("stats")', "noiseSuppression: false"):
            assert needle in page, needle

    def test_page_js_brackets_balanced(self, daemon):
        """Cheap syntax smoke for the inline JS (no JS engine here):
        brackets balance outside string/template/comment contexts."""
        _head, body = _http_get("/")
        page = body.decode()
        script = page.split("<script>")[1].split("</script>")[0]
        depth = {"(": 0, "[": 0, "{": 0}
        close = {")": "(", "]": "[", "}": "{"}
        in_str = None
        esc = False
        i = 0
        while i < len(script):
            c = script[i]
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == in_str:
                    in_str = None
                i += 1
                continue
            if c in "'\"`":
                in_str = c
            elif c == "/" and i + 1 < len(script) and script[i + 1] == "/":
                i = script.find("\n", i)
                if i < 0:
                    break
            elif c in depth:
                depth[c] += 1
            elif c in close:
                depth[close[c]] -= 1
                assert depth[close[c]] >= 0, f"unbalanced {c} at {i}"
            i += 1
        assert in_str is None and all(v == 0 for v in depth.values()), depth

    def test_404_and_405(self, daemon):
        head, _ = _http_get("/nonexistent")
        assert b"404" in head.split(b"\r\n")[0]
        head, _ = _http_get("/", method="POST")
        assert b"405" in head.split(b"\r\n")[0]

    def test_page_wire_format_round_trips(self, daemon):
        """Drive the daemon exactly as the page's JS does: one hop of
        int16-LE PCM per binary frame (capture worklet framing), a
        "stats" text frame interleaved (the page's 1 Hz timer)."""
        hop = daemon.hop
        sock = _client_connect(("localhost", PORT))
        try:
            rng = np.random.default_rng(7)
            hops = 6
            f32 = np.clip(0.1 * rng.standard_normal(hops * hop), -1, 1)
            i16 = np.round(f32 * 32767).astype("<i2")   # page: round+clamp
            sock.settimeout(30)
            got = b""
            stats_seen = False
            for k in range(hops):
                _client_send(sock, i16[k * hop:(k + 1) * hop].tobytes())
                if k == 2:
                    _client_send(sock, b"stats", ws.OP_TEXT)
            deadline = time.time() + 30
            while (len(got) < hops * hop * 2 or not stats_seen) \
                    and time.time() < deadline:
                fin, op, payload = ws.recv_frame(sock)
                if op == ws.OP_TEXT:
                    stats = json.loads(payload)
                    assert "active_streams" in stats
                    stats_seen = True
                elif op == ws.OP_BINARY:
                    got += payload
            out = np.frombuffer(got, "<i2")
            assert out.shape == (hops * hop,)
            assert stats_seen
            # denoised output is audio, not garbage: bounded int16 that
            # the page converts back via /32768
            assert np.abs(out.astype(np.float32) / 32768).max() <= 1.0
        finally:
            sock.close()

    def test_ws_upgrade_still_works_after_http(self, daemon):
        _http_get("/")
        sock = _client_connect(("localhost", PORT))
        try:
            _client_send(sock, b"stats", ws.OP_TEXT)
            sock.settimeout(15)
            fin, op, payload = ws.recv_frame(sock)
            assert op == ws.OP_TEXT
        finally:
            sock.close()

"""Serving layer: dynamic batching semantics + the HTTP surface."""

import io
import json
import threading
import urllib.request
import wave as wave_mod
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pytest

from viettts_tpu.serve import (
    DynamicBatcher,
    QueueFullError,
    TTSServer,
    wav_bytes,
)

# real-Synthesizer fixtures (module-scoped; re-instantiated per module)
from tests.test_pipeline import tiny_cfg, ckpt_dir, synth  # noqa: F401


@dataclass
class _FakeResult:
    wave: np.ndarray


class _FakeSynth:
    """Records batch compositions; returns per-text dummy waves."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def synthesize_batch(self, texts, silence_duration=-1.0):
        with self.lock:
            self.calls.append((list(texts), silence_duration))
        return [
            _FakeResult(np.full(100 + len(t), 0.1, np.float32)) for t in texts
        ]


def test_batcher_coalesces_concurrent_requests():
    fake = _FakeSynth()
    b = DynamicBatcher(fake, max_batch=8, batch_window_ms=500.0)
    try:
        with ThreadPoolExecutor(4) as ex:
            futs = [
                ex.submit(b.submit, f"text number {i}") for i in range(4)
            ]
            waves = [f.result(timeout=30) for f in futs]
        # each request got its own wave, length keyed to its text
        lengths = sorted(len(w) for w in waves)
        assert lengths == sorted(100 + len(f"text number {i}") for i in range(4))
        # requests were coalesced: fewer calls than requests
        assert len(fake.calls) < 4
        assert sum(len(texts) for texts, _ in fake.calls) == 4
        s = b.stats()
        assert s["requests"] == 4 and s["batches"] == len(fake.calls)
        assert s["mean_batch_size"] > 1
    finally:
        b.close()


def test_batcher_groups_by_silence_duration():
    fake = _FakeSynth()
    b = DynamicBatcher(fake, max_batch=8, batch_window_ms=500.0)
    try:
        with ThreadPoolExecutor(4) as ex:
            futs = [
                ex.submit(b.submit, f"t{i}", (-1.0 if i % 2 else 0.5))
                for i in range(4)
            ]
            for f in futs:
                f.result(timeout=30)
        sds = sorted(sd for _, sd in fake.calls)
        assert set(sds) == {-1.0, 0.5}
        for texts, sd in fake.calls:
            assert len(texts) <= 2  # never mixes clamp values
    finally:
        b.close()


def test_wav_bytes_roundtrip():
    data = np.sin(np.linspace(0, 20, 1600)).astype(np.float32) * 0.5
    blob = wav_bytes(data, 16000)
    with wave_mod.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, data, atol=1e-4)


def test_http_server_end_to_end(synth):  # noqa: F811
    server = TTSServer(synth, host="127.0.0.1", port=0, batch_window_ms=50.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        req = urllib.request.Request(
            base + "/tts",
            data=json.dumps({"text": "một hai ba"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            blob = r.read()
        with wave_mod.open(io.BytesIO(blob)) as w:
            assert w.getframerate() == synth.cfg.dsp.sample_rate
            assert w.getnframes() > 0

        # malformed request -> 400
        bad = urllib.request.Request(base + "/tts", data=b'{"nope": 1}')
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert s["requests"] >= 1
    finally:
        server.shutdown()


def test_http_streaming_endpoint(synth):  # noqa: F811
    """POST /tts/stream returns chunked 16-bit PCM whose sample count
    matches the one-shot /tts WAV for the same text."""
    server = TTSServer(synth, host="127.0.0.1", port=0, batch_window_ms=5.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        payload = json.dumps({"text": "một hai ba"}).encode()
        req = urllib.request.Request(
            base + "/tts/stream", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["X-Sample-Rate"] == str(
                synth.cfg.dsp.sample_rate
            )
            pcm = r.read()  # urllib reassembles the chunked body
        assert len(pcm) > 0 and len(pcm) % 2 == 0

        req = urllib.request.Request(
            base + "/tts", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            blob = r.read()
        with wave_mod.open(io.BytesIO(blob)) as w:
            assert w.getnframes() == len(pcm) // 2
    finally:
        server.shutdown()


def test_http_stream_error_truncates_chunked_body():
    """A mid-stream synthesis failure must NOT look like a clean end of
    audio: the chunked body is left unterminated so the client's read
    raises instead of returning a silently shortened waveform."""
    import http.client
    from types import SimpleNamespace

    class _FakeStreamErrSynth(_FakeSynth):
        def __init__(self):
            super().__init__()
            self.cfg = SimpleNamespace(dsp=SimpleNamespace(sample_rate=16000))

        def stream(self, text, silence_duration=-1.0):
            yield _FakeResult(np.full(1000, 0.1, np.float32))
            raise RuntimeError("vocoder exploded")

    server = TTSServer(_FakeStreamErrSynth(), host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/tts/stream",
            data=json.dumps({"text": "x"}).encode(),
        )
        with pytest.raises((http.client.IncompleteRead, ConnectionError)):
            with urllib.request.urlopen(req, timeout=30) as r:
                r.read()
    finally:
        server.shutdown()


def test_batcher_sheds_load_when_queue_full():
    """Admission control: once the pending queue reaches max_pending,
    submit() raises QueueFullError (with a retry hint) instead of growing
    the queue without bound; accepted requests still complete."""
    import time

    release = threading.Event()
    fake = _FakeSynth()
    real_synthesize = fake.synthesize_batch

    def blocking_synthesize(texts, silence_duration=-1.0):
        release.wait(30)
        return real_synthesize(texts, silence_duration)

    fake.synthesize_batch = blocking_synthesize
    b = DynamicBatcher(fake, max_batch=4, batch_window_ms=1.0, max_pending=3)
    try:
        with ThreadPoolExecutor(8) as ex:
            # the worker picks up the first request and blocks on `release`
            blocker = ex.submit(b.submit, "blocker")
            time.sleep(0.15)
            # fill the pending queue to its cap
            queued = [ex.submit(b.submit, f"q{i}") for i in range(3)]
            time.sleep(0.15)
            # the queue is now full: further submissions are refused
            with pytest.raises(QueueFullError) as ei:
                b.submit("overflow")
            assert ei.value.pending == 3
            assert ei.value.retry_after_s >= 1
            assert len(b._queue) <= b.max_pending  # bounded memory
            release.set()
            assert len(blocker.result(timeout=30)) > 0
            for f in queued:
                assert len(f.result(timeout=30)) > 0
        s = b.stats()
        assert s["rejected"] == 1
        assert s["requests"] == 4  # overflow never synthesized
        assert "overflow" not in [
            t for texts, _ in fake.calls for t in texts
        ]
    finally:
        release.set()
        b.close()


def test_http_429_on_overload():
    """The HTTP layer maps QueueFullError to 429 + Retry-After."""
    import time
    import urllib.error
    from types import SimpleNamespace

    release = threading.Event()

    class _SlowSynth(_FakeSynth):
        def __init__(self):
            super().__init__()
            self.cfg = SimpleNamespace(dsp=SimpleNamespace(sample_rate=16000))

        def synthesize_batch(self, texts, silence_duration=-1.0):
            release.wait(30)
            return super().synthesize_batch(texts, silence_duration)

    server = TTSServer(
        _SlowSynth(), host="127.0.0.1", port=0,
        batch_window_ms=1.0, max_pending=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.port}"

    def post(text):
        req = urllib.request.Request(
            base + "/tts", data=json.dumps({"text": text}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.read()

    try:
        with ThreadPoolExecutor(4) as ex:
            blocker = ex.submit(post, "blocker")   # worker blocks on it
            time.sleep(0.2)
            queued = ex.submit(post, "queued")     # fills max_pending=1
            time.sleep(0.2)
            with pytest.raises(urllib.error.HTTPError) as ei:
                post("overflow")
            assert ei.value.code == 429
            assert int(ei.value.headers["Retry-After"]) >= 1
            body = json.loads(ei.value.read())
            assert body["pending"] == 1
            release.set()
            assert len(blocker.result(timeout=30)) > 0
            assert len(queued.result(timeout=30)) > 0

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert s["rejected"] == 1 and s["max_pending"] == 1
    finally:
        release.set()
        server.shutdown()


def test_batcher_timeout_cancels_request():
    """A timed-out submit() marks its request cancelled: the worker skips
    it (no wasted batch slot, no stats entry) instead of synthesizing
    audio nobody will read."""
    import time

    release = threading.Event()
    fake = _FakeSynth()
    real_synthesize = fake.synthesize_batch

    def blocking_synthesize(texts, silence_duration=-1.0):
        release.wait(30)
        return real_synthesize(texts, silence_duration)

    fake.synthesize_batch = blocking_synthesize
    b = DynamicBatcher(fake, max_batch=8, batch_window_ms=1.0)
    try:
        # first request occupies the worker (blocked on `release`)
        with ThreadPoolExecutor(2) as ex:
            fut = ex.submit(b.submit, "blocker")
            time.sleep(0.1)
            # second request times out while queued behind the blocker
            with pytest.raises(TimeoutError):
                b.submit("too late", timeout=0.2)
            release.set()
            fut.result(timeout=30)
        # give the worker a moment to drain the cancelled request
        time.sleep(0.3)
        synthesized = [t for texts, _ in fake.calls for t in texts]
        assert "blocker" in synthesized
        assert "too late" not in synthesized
        assert b.stats()["requests"] == 1
    finally:
        release.set()
        b.close()

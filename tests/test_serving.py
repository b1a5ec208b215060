"""Serving runtime: RLE wire format, batch buckets, micro-batcher, HTTP.

The reference has no serving story; this pins the beyond-reference
deployment path: exported artifact -> ArtifactRunner (power-of-two batch
buckets) -> MicroBatcher (request coalescing) -> HTTP endpoint.
"""

import base64
import http.client
import io
import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from avtubes.core.serving import (ArtifactRunner, MicroBatcher, mask_box,
                                  mask_to_rle, rle_to_mask)

# ------------------------------------------------------------- wire format


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (7, 5), (224, 224)]:
        for p in (0.0, 0.3, 1.0):
            mask = (rng.random(shape) < p).astype(np.float32)
            counts = mask_to_rle(mask)
            assert sum(counts) == mask.size
            assert all(c >= 0 for c in counts)
            np.testing.assert_array_equal(rle_to_mask(counts, shape), mask)


def test_rle_starts_with_zero_run():
    counts = mask_to_rle(np.array([[1, 1, 0]], np.float32))
    assert counts == [0, 2, 1]


def test_mask_box():
    m = np.zeros((10, 10))
    assert mask_box(m) is None
    m[2:5, 3:7] = 1
    assert mask_box(m) == [3, 2, 6, 4]


# ------------------------------------------------------- micro-batcher

class _FakeRunner:
    """Stands in for ArtifactRunner: records batch sizes, echoes inputs."""

    max_batch = 4

    def __init__(self, fail=False):
        self.batches = []
        self.fail = fail

    def run(self, frames, waves):
        if self.fail:
            raise RuntimeError("device exploded")
        self.batches.append(len(frames))
        n = len(frames)
        return (np.full((n, 2, 2), frames[:, 0, 0, 0, None, None], np.float32),
                np.zeros((n, 2, 2), np.float32))


def test_microbatcher_coalesces_concurrent_requests():
    runner = _FakeRunner()
    batcher = MicroBatcher(runner, window_ms=2000.0)
    try:
        results = [None] * 4
        frame = lambda i: np.full((4, 4, 3), i, np.uint8)

        def call(i):
            results[i] = batcher.submit(frame(i), np.zeros(8, np.float32),
                                        timeout=60.0)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # each caller got ITS result back, not a neighbor's
        for i in range(4):
            assert float(results[i][0][0, 0]) == float(i)
        stats = batcher.snapshot()
        assert stats["requests"] == 4
        # max_batch=4 concurrent submits within a wide window -> coalesced
        # batches, never 1-per-call (scheduling on a loaded 1-core host may
        # split off early arrivals, so don't demand a single batch of 4)
        assert stats["batches"] <= 3
        assert max(runner.batches) >= 2
    finally:
        batcher.close()


def test_microbatcher_propagates_errors_and_keeps_serving():
    runner = _FakeRunner(fail=True)
    batcher = MicroBatcher(runner, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device exploded"):
            batcher.submit(np.zeros((4, 4, 3), np.uint8),
                           np.zeros(8, np.float32), timeout=60.0)
        runner.fail = False
        mask, _ = batcher.submit(np.zeros((4, 4, 3), np.uint8),
                                 np.zeros(8, np.float32), timeout=60.0)
        assert mask.shape == (2, 2)
        assert batcher.snapshot()["errors"] == 1
    finally:
        batcher.close()


def test_microbatcher_drops_timed_out_requests():
    """A request whose client timed out must not burn device time later."""
    gate = threading.Event()
    runner = _FakeRunner()
    real_run = runner.run

    def gated_run(frames, waves):
        gate.wait(30.0)
        return real_run(frames, waves)

    runner.run = gated_run
    batcher = MicroBatcher(runner, window_ms=1.0)
    try:
        # A occupies the dispatcher (blocked in run); B times out while
        # queued; C stays live.  When the dispatcher assembles the next
        # batch, the cancelled B must be dropped.
        t_a = threading.Thread(target=lambda: batcher.submit(
            np.zeros((4, 4, 3), np.uint8), np.zeros(8, np.float32),
            timeout=30.0))
        t_a.start()
        time.sleep(0.2)  # let the dispatcher dequeue A and block
        with pytest.raises(TimeoutError):
            batcher.submit(np.full((4, 4, 3), 1, np.uint8),
                           np.zeros(8, np.float32), timeout=0.05)
        done_c = []
        t_c = threading.Thread(target=lambda: done_c.append(batcher.submit(
            np.full((4, 4, 3), 2, np.uint8), np.zeros(8, np.float32),
            timeout=30.0)))
        t_c.start()
        gate.set()
        t_a.join()
        t_c.join()
        assert done_c and float(done_c[0][0][0, 0]) == 2.0
        stats = batcher.snapshot()
        assert stats["cancelled"] == 1
        # the zombie B (fill value 1) never reached the device
        assert stats["requests"] == 2
    finally:
        gate.set()
        batcher.close()


# ------------------------------------------------- artifact runner + HTTP

IMG, SR, SEC = 64, 2000, 1


def _export_test_artifact(audio_transport: str = "float32") -> bytes:
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.core.export import export_localizer
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state

    spec_cfg = SpectrogramConfig(samplerate=SR, seconds=SEC)
    model = AVENet()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        OptimConfig())
    return export_localizer(state, spec_cfg, image_size=IMG,
                            platforms=("cpu",),
                            audio_transport=audio_transport)


@pytest.fixture(scope="module")
def artifact():
    return _export_test_artifact()


def test_artifact_meta_header(artifact):
    from avtubes.core.export import load_artifact

    fn, meta = load_artifact(artifact)
    assert meta["image_size"] == IMG
    assert meta["samplerate"] == SR
    assert meta["num_samples"] == SR * SEC
    assert meta["batch"] is None  # batch-polymorphic


def test_runner_buckets_and_padding(artifact):
    runner = ArtifactRunner(artifact, max_batch=4)
    assert runner.buckets == [1, 2, 4]
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, IMG, IMG, 3), np.uint8)
    waves = rng.random((3, SR * SEC), np.float32)
    masks3, heat3 = runner.run(frames, waves)  # padded 3 -> 4
    assert masks3.shape[0] == heat3.shape[0] == 3
    # padding must not perturb real samples: same inputs at exact bucket 2
    masks2, heat2 = runner.run(frames[:2], waves[:2])
    np.testing.assert_allclose(heat2, heat3[:2], atol=1e-5)
    # chunking above max_batch
    masks6, _ = runner.run(np.tile(frames, (2, 1, 1, 1)),
                           np.tile(waves, (2, 1)))
    assert masks6.shape[0] == 6


def test_runner_transport_artifacts_match_f32(artifact):
    """An artifact exported with an audio transport (int16 PCM / spec
    payloads) must serve identically through `ArtifactRunner`: f32
    waveforms are host-encoded transparently, pre-encoded payloads pass
    through, and the results match the f32-waveform artifact
    (bit-identically for 'int16' on 16-bit-grid sources; within the
    transport's quantization for the spec payloads)."""
    base = ArtifactRunner(artifact, max_batch=2)
    assert base.audio_transport == "float32"
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, IMG, IMG, 3), np.uint8)
    # int16-grid waveforms: 'int16' transport round trip is then exact
    waves = (rng.integers(-32768, 32768, (2, SR * SEC))
             .astype(np.float32) / 32768.0)
    _, h_ref = base.run(frames, waves)
    h_ref = np.asarray(h_ref, np.float64)

    for transport, corr_min in [("int16", None), ("spec_int16", 0.999),
                                ("spec_int8", 0.99)]:
        runner = ArtifactRunner(_export_test_artifact(transport),
                                max_batch=2)
        assert runner.audio_transport == transport
        m1, h1 = runner.run(frames, waves)            # f32 waveforms in
        payload = runner.prepare_audio(waves)
        assert payload.dtype == runner.audio_dtype
        assert payload.shape[1:] == runner.audio_shape
        m2, h2 = runner.run(frames, payload)          # wire payload in
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        if corr_min is None:
            np.testing.assert_allclose(np.asarray(h1), h_ref,
                                       rtol=1e-6, atol=1e-6)
        else:
            c = np.corrcoef(np.asarray(h1, np.float64).ravel(),
                            h_ref.ravel())[0, 1]
            assert c > corr_min, f"{transport}: heatmap corr {c}"
        runner.warmup()  # transport-dtype zero payloads compile every bucket


def test_runner_rejects_mismatched_audio(artifact):
    runner = ArtifactRunner(_export_test_artifact("spec_int16"), max_batch=2)
    with pytest.raises(ValueError, match="matches neither"):
        runner.run(np.zeros((1, IMG, IMG, 3), np.uint8),
                   np.zeros((1, 7), np.float32))


def _jpeg_b64(rng) -> str:
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (80, 96, 3), np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def _wav_b64(rng, samplerate: int, n: int) -> str:
    import struct

    pcm = (rng.random(n) * 2 - 1).astype(np.float64)
    raw = (pcm * 32767).astype("<i2").tobytes()
    head = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, samplerate,
                          samplerate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(raw)))
    return base64.b64encode(head + raw).decode()


@pytest.fixture(scope="module")
def server(artifact):
    from avtubes.cli.serve import build_handler

    runner = ArtifactRunner(artifact, max_batch=2)
    batcher = MicroBatcher(runner, window_ms=2.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        build_handler(batcher, runner.meta, 120.0, max_request_mb=0.5))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()
    batcher.close()


def _post(url, obj, timeout=300.0):
    req = urllib.request.Request(
        url + "/localize", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_localize_end_to_end(server):
    rng = np.random.default_rng(0)
    code, resp = _post(server, {"image": _jpeg_b64(rng),
                                "audio": _wav_b64(rng, SR, SR * SEC)})
    assert code == 200, resp
    heat = np.asarray(resp["heatmap"])
    assert heat.shape == (IMG // 16, IMG // 16)
    assert np.isfinite(heat).all()
    mask = rle_to_mask(resp["mask_rle"], tuple(resp["mask_shape"]))
    assert set(np.unique(mask)) <= {0.0, 1.0}
    box = resp["box"]
    assert box is None or (len(box) == 4 and box[0] <= box[2])


def test_http_resamples_mismatched_wav(server):
    rng = np.random.default_rng(1)
    code, resp = _post(server, {"image": _jpeg_b64(rng),
                                "audio": _wav_b64(rng, 4000, 4000)})
    assert code == 200, resp


def test_http_pcm_input(server):
    rng = np.random.default_rng(2)
    pcm = (rng.random(SR * SEC).astype("<f4") * 2 - 1).tobytes()
    code, resp = _post(server, {"image": _jpeg_b64(rng),
                                "pcm": base64.b64encode(pcm).decode(),
                                "samplerate": SR})
    assert code == 200, resp


def test_http_bad_request(server):
    code, resp = _post(server, {"image": base64.b64encode(b"junk").decode(),
                                "audio": base64.b64encode(b"junk").decode()})
    assert code == 400
    assert "error" in resp


def test_http_non_dict_and_non_string_bodies(server):
    """Malformed-but-valid-JSON bodies must 400, not kill the connection."""
    code, resp = _post(server, [1, 2, 3])
    assert code == 400 and "error" in resp
    code, resp = _post(server, {"image": 123, "audio": 456})
    assert code == 400 and "error" in resp


def test_http_oversized_body_413(server):
    rng = np.random.default_rng(3)
    big = base64.b64encode(rng.bytes(700_000)).decode()  # > 0.5 MB cap
    try:
        code, resp = _post(server, {"image": big, "audio": big})
        assert code == 413 and "error" in resp
    except (ConnectionError, urllib.error.URLError):
        pass  # server may close mid-upload rather than drain the body
    # either way the server must still be alive and sane afterwards
    with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_http_keepalive_survives_wrong_path_post(server):
    """POSTing a body to an unknown path must drain the body, keeping the
    persistent connection usable for the next request."""
    host = server.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=120)
    try:
        conn.request("POST", "/nope", body=json.dumps({"x": 1}),
                     headers={"Content-Type": "application/json"})
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        conn.request("GET", "/healthz")  # same socket
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["status"] == "ok"
    finally:
        conn.close()


def test_loadtest_tool_against_live_server(server, capsys):
    """The capacity-planning CLI sweeps the live endpoint and reports
    throughput + latency percentiles + the server's batch histogram."""
    from avtubes.tools.loadtest import main

    main(["--url", server, "--concurrency", "1,2", "--requests", "4",
          "--payloads", "2", "--timeout_s", "300"])
    # the in-process server's JSONL access log shares stdout: filter by key
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    server_line = next(l for l in lines if "server" in l)
    assert server_line["server"]["image_size"] == IMG
    levels = [l for l in lines if "concurrency" in l]
    assert len(levels) == 2
    for level in levels:
        assert level["errors"] == 0
        assert level["ok"] == 4
        assert level["requests_per_sec"] > 0
        assert level["p50_ms"] > 0
        assert level["server_stats"]["batches"] >= 1


def test_http_health_and_stats(server):
    with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["model"]["image_size"] == IMG
    with urllib.request.urlopen(server + "/stats", timeout=60) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 3
    assert stats["batches"] >= 1


def test_http_serves_transport_artifact():
    """The HTTP contract is transport-invariant: a spec_int8 artifact
    serves the same WAV request (the handler encodes the payload
    host-side) and reports its transport in /healthz."""
    from avtubes.cli.serve import build_handler

    runner = ArtifactRunner(_export_test_artifact("spec_int8"), max_batch=2)
    batcher = MicroBatcher(runner, window_ms=1.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), build_handler(batcher, runner.meta, 120.0))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        rng = np.random.default_rng(5)
        code, resp = _post(url, {"image": _jpeg_b64(rng),
                                 "audio": _wav_b64(rng, SR, SR * SEC)})
        assert code == 200, resp
        heat = np.asarray(resp["heatmap"])
        assert heat.shape == (IMG // 16, IMG // 16)
        assert np.isfinite(heat).all()
        with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["model"]["audio_transport"] == "spec_int8"
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_http_fast_decode(artifact):
    """--fast_decode wiring: the server decodes request JPEGs with the
    native DCT-scaled path; the response contract is unchanged and the
    heatmap closely tracks the exact-decode server on the same payload
    (decode-level parity itself is pinned in tests/test_native.py)."""
    from avtubes.cli.serve import build_handler

    rng = np.random.default_rng(6)
    payload = {"image": _jpeg_b64(rng), "audio": _wav_b64(rng, SR, SR * SEC)}
    heats = {}
    for fast in (False, True):
        runner = ArtifactRunner(artifact, max_batch=2)
        batcher = MicroBatcher(runner, window_ms=1.0)
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), build_handler(batcher, runner.meta, 120.0,
                                            fast_decode=fast))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            code, resp = _post(url, payload)
            assert code == 200, resp
            heat = np.asarray(resp["heatmap"])
            assert heat.shape == (IMG // 16, IMG // 16)
            assert np.isfinite(heat).all()
            heats[fast] = heat
        finally:
            httpd.shutdown()
            httpd.server_close()
            batcher.close()
    # random-noise source + tiny random-init model: exact agreement is not
    # guaranteed, but the decodes differ by ~2 levels so heatmaps must track
    assert np.abs(heats[True] - heats[False]).max() < 0.15


def test_sharded_runner_matches_single_device(artifact):
    """ShardedArtifactRunner over the 8-device CPU mesh: bucket sizes are
    multiples of the mesh, and outputs equal the single-device runner at
    padded, exact-bucket, and above-max (chunked) batch sizes."""
    from avtubes.core.serving import ShardedArtifactRunner

    single = ArtifactRunner(artifact, max_batch=16)
    sharded = ShardedArtifactRunner(artifact, max_batch=16)
    n = int(sharded.mesh.devices.size)
    assert n == 8
    assert all(b % n == 0 for b in sharded.buckets)
    assert sharded.max_batch == 16

    rng = np.random.default_rng(1)
    for batch in (1, 3, 8, 16, 19):  # pad, pad, exact bucket, max, chunked
        frames = rng.integers(0, 255, (batch, IMG, IMG, 3), np.uint8)
        waves = rng.random((batch, SR * SEC), np.float32)
        m0, h0 = single.run(frames, waves)
        m1, h1 = sharded.run(frames, waves)
        assert m1.shape[0] == h1.shape[0] == batch
        np.testing.assert_allclose(h1, h0, atol=1e-5)
        # masks are median-thresholded heatmaps; allow a few threshold-edge
        # pixel flips from the summation-order change across shards
        assert np.mean(m1 != m0) < 1e-3


def test_sharded_runner_rejects_indivisible_fixed_batch(artifact):
    """A fixed-batch artifact that doesn't divide over the mesh must fail
    loudly at construction, not at serve time."""
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.core.export import export_localizer
    from avtubes.core.serving import ShardedArtifactRunner
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state

    spec_cfg = SpectrogramConfig(samplerate=SR, seconds=SEC)
    state = create_train_state(
        AVENet(), jax.random.PRNGKey(0),
        (jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        OptimConfig())
    fixed = export_localizer(state, spec_cfg, image_size=IMG, batch=3,
                             platforms=("cpu",))
    with pytest.raises(ValueError, match="cannot shard"):
        ShardedArtifactRunner(fixed)

"""Seeded mutation fuzz over the native decode APIs.

The C++ IO core consumes untrusted files inside std::thread workers, where
an escaped exception or an unchecked allocation kills the whole process
(std::terminate) — a single corrupt sample must never take down a trainer.
These tests hammer every decode entry point with deterministic random
corruptions of valid files and assert the process survives and failures
surface as per-item None/0 results.  Complements the targeted guard tests
in test_native.py (lying chunk sizes, truncated fmt, giant/extreme-aspect
SOF dims).
"""

import numpy as np
import pytest

from avtubes import native
from avtubes.data.audio import write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

N_MUTANTS = 60  # per corpus file; keep the whole module under ~10 s


def _mutants(data: bytes, rng: np.random.RandomState, n: int):
    """Deterministic corruptions: byte flips, truncations, extensions."""
    arr = np.frombuffer(data, np.uint8).copy()
    for k in range(n):
        mode = k % 3
        if mode == 0:  # flip 1-8 random bytes (headers are at the front,
            m = arr.copy()  # so bias half the flips into the first 64)
            idx = rng.randint(0, min(64, len(m)) if k % 2 else len(m),
                              size=rng.randint(1, 9))
            m[idx] ^= rng.randint(1, 256, size=idx.size).astype(np.uint8)
            yield m.tobytes()
        elif mode == 1:  # truncate at a random point
            yield data[:rng.randint(0, len(data))]
        else:  # append random trailing garbage
            yield data + rng.randint(0, 256, rng.randint(1, 128),
                                     dtype=np.uint8).tobytes()


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzzwav")
    p = d / "base.wav"
    rng = np.random.RandomState(0)
    write_wav(p, np.clip(rng.randn(8000) * 0.3, -1, 1), 8000)
    return d, p.read_bytes()


@pytest.fixture(scope="module")
def jpg_corpus(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("fuzzjpg")
    p = d / "base.jpg"
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
        p, quality=90)
    return d, p.read_bytes()


def test_fuzz_wav_single_and_batch(wav_corpus):
    d, base = wav_corpus
    rng = np.random.RandomState(42)
    paths = []
    for i, mut in enumerate(_mutants(base, rng, N_MUTANTS)):
        p = d / f"m{i}.wav"
        p.write_bytes(mut)
        paths.append(p)
        # single-call path: must return a result or None, never raise/abort.
        # (No finiteness assert: a mutant that flips the fmt tag to float32
        # legitimately reinterprets PCM bytes as floats, and NaN passes
        # through exactly as it does in soundfile/numpy — crash-safety is
        # the contract here, sample values are not.)
        res = native.decode_wav_prepared(p, 1, 8000)
        assert res is None or res[0].shape == (8000,)
    # threaded batch path: per-item failures only (failed rows of the
    # np.empty output buffer stay uninitialized by design — don't read them)
    out, rates = native.decode_wav_batch(paths, 1, 8000, threads=4)
    assert out.shape == (len(paths), 8000)
    assert rates.shape == (len(paths),)


def test_fuzz_wav_spec_batch(wav_corpus):
    d, base = wav_corpus
    rng = np.random.RandomState(43)
    paths = []
    for i, mut in enumerate(_mutants(base, rng, N_MUTANTS)):
        p = d / f"s{i}.wav"
        p.write_bytes(mut)
        paths.append(p)
    sr, nperseg, noverlap = 8000, 512, 1
    wav_len = sr
    frames = (wav_len - noverlap) // (nperseg - noverlap)
    res = native.decode_wav_spec_batch(
        paths, seconds=1, wav_len=wav_len, samplerate=sr, nperseg=nperseg,
        noverlap=noverlap, num_freqs=nperseg // 2 + 1, num_frames=frames)
    assert res is not None
    spec, rates = res
    assert rates.shape == (len(paths),)
    ok = rates > 0
    assert np.all(np.isfinite(spec[ok].astype(np.float32)))


def test_fuzz_jpeg_all_paths(jpg_corpus):
    d, base = jpg_corpus
    rng = np.random.RandomState(44)
    paths = []
    for i, mut in enumerate(_mutants(base, rng, N_MUTANTS)):
        p = d / f"m{i}.jpg"
        p.write_bytes(mut)
        paths.append(p)
        native.jpeg_size(p)                      # header probe
        native.decode_jpeg(p)                    # full decode
        native.decode_jpeg_shortest(p, 96, crop=64)   # fused eval path
        native.decode_jpeg_shortest(p, 96, crop=0)    # variable-size path
    # threaded batch + fused training-clip paths
    out, ok = native.decode_jpeg_shortest_batch(paths, 96, 64, threads=4)
    assert ok.shape == (len(paths),)
    native.decode_clip_train(paths[:16], 96, 64, 0, 0, threads=4)


def test_fuzz_jpeg_mem_path(jpg_corpus):
    """The in-memory entry consumes UNTRUSTED serving-request bytes when
    --fast_decode is on: every corruption must surface as None (or decode
    cleanly), never crash across the FFI boundary.  Mutants that keep the
    JPEG magic exercise the native decoder; the rest pin the magic gate."""
    _, base = jpg_corpus
    rng = np.random.RandomState(45)
    decoded = failed = gated = 0
    for mut in _mutants(base, rng, N_MUTANTS):
        for scaled in (False, True):
            out = native.decode_jpeg_shortest_bytes(mut, 96, crop=64,
                                                    scaled=scaled)
            if out is None:
                if mut[:3] != b"\xff\xd8\xff":
                    gated += 1
                else:
                    failed += 1
            else:
                assert out.shape == (64, 64, 3)
                decoded += 1
    assert decoded + failed + gated == 2 * N_MUTANTS
    assert decoded > 0  # some mutants survive (trailing-garbage ones)

"""Native C++ IO core: parity with Python paths + threaded batch correctness."""

import numpy as np
import pytest

from avtubes import native
from avtubes.data.audio import prepare_waveform, read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++/libjpeg)")


def test_wav_decode_parity(tmp_path):
    rng = np.random.RandomState(0)
    sr = 22050
    x = np.clip(rng.randn(sr * 3) * 0.4, -1, 1)
    p = tmp_path / "t.wav"
    write_wav(p, x, sr)
    out, got_sr = native.decode_wav_prepared(p, 10, sr * 10)
    assert got_sr == sr
    samples, _ = read_wav(p)
    ref = prepare_waveform(samples, sr, 10).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def test_wav_batch_threaded(tmp_path):
    sr = 8000
    paths = []
    for i in range(12):
        p = tmp_path / f"{i}.wav"
        write_wav(p, np.full(sr, (i + 1) / 20.0), sr)
        paths.append(p)
    out, rates = native.decode_wav_batch(paths, 2, sr * 2, threads=4)
    assert np.all(rates == sr)
    for i in range(12):
        expected = round((i + 1) / 20.0 * 32767) / 32768
        np.testing.assert_allclose(out[i], expected, atol=1e-6)


def test_wav_decode_failure_returns_none(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"garbage")
    assert native.decode_wav_prepared(p, 1, 100) is None


def test_jpeg_decode_parity(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    p = tmp_path / "t.jpg"
    Image.fromarray(img).save(p, quality=95)
    ours = native.decode_jpeg(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)
    assert native.jpeg_size(p) == (48, 64)


def test_jpeg_batch(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        imgs.append(np.asarray(Image.open(p).convert("RGB")))
    paths.append(tmp_path / "missing.jpg")
    out, ok = native.decode_jpeg_batch(paths, 32, 32, threads=3)
    assert list(ok) == [1] * 6 + [0]
    for i in range(6):
        np.testing.assert_array_equal(out[i], imgs[i])

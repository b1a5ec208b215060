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


def _pil_shortest_crop(path, short_side, crop):
    from PIL import Image

    from avtubes.data.transforms import host_center_crop, host_resize_shortest, open_rgb

    arr = np.asarray(host_resize_shortest(open_rgb(path), short_side))
    return host_center_crop(arr, crop) if crop else arr


def test_jpeg_shortest_precise_matches_pil(tmp_path):
    # scaled=False decodes at full resolution then runs the PIL-parity
    # bicubic (incl. Pillow's uint8 quantization between passes); Pillow
    # resamples in fixed point vs our float, so the residual is <=1 level
    from PIL import Image

    rng = np.random.RandomState(3)
    for shape in ((480, 640), (640, 480), (300, 300)):
        img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        p = tmp_path / f"{shape[0]}x{shape[1]}.jpg"
        Image.fromarray(img).save(p, quality=92)
        ours = native.decode_jpeg_shortest(p, 224, crop=224, scaled=False)
        ref = _pil_shortest_crop(p, 224, 224)
        assert ours.shape == ref.shape == (224, 224, 3)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert diff.mean() < 0.01


def test_jpeg_shortest_nocrop_geometry(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (480, 640, 3), dtype=np.uint8)
    p = tmp_path / "t.jpg"
    Image.fromarray(img).save(p, quality=92)
    out = native.decode_jpeg_shortest(p, 224, crop=0, scaled=False)
    # shortest side -> 224, long side scales by the same factor (PIL rounding)
    ref = _pil_shortest_crop(p, 224, 0)
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_shortest_scaled_close_on_natural_image(tmp_path):
    # DCT-domain scaled decode drifts a little vs full-res + bicubic; on a
    # smooth (natural-image-like) gradient it must stay within a few levels
    from PIL import Image

    yy, xx = np.mgrid[0:512, 0:768]
    img = np.stack([(yy // 2) % 256, (xx // 3) % 256,
                    ((yy + xx) // 4) % 256], -1).astype(np.uint8)
    p = tmp_path / "grad.jpg"
    Image.fromarray(img).save(p, quality=95)
    precise = native.decode_jpeg_shortest(p, 224, crop=224, scaled=False)
    fast = native.decode_jpeg_shortest(p, 224, crop=224, scaled=True)
    assert np.abs(precise.astype(int) - fast.astype(int)).mean() < 4.0


def test_jpeg_shortest_rounding_tie(tmp_path):
    # 641x448 -> long side 641*224/448 = 320.5 exactly: Python round() and
    # the C++ dim math must both round half-to-even (320), or the C++ side
    # writes one row past the wrapper-allocated buffer
    from PIL import Image

    rng = np.random.RandomState(6)
    p = tmp_path / "tie.jpg"
    Image.fromarray(rng.randint(0, 256, (641, 448, 3), np.uint8)).save(p, quality=92)
    out = native.decode_jpeg_shortest(p, 224, crop=0, scaled=False)
    ref = _pil_shortest_crop(p, 224, 0)
    assert out.shape == ref.shape == (320, 224, 3)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_shortest_batch(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(5)
    paths = []
    for i in range(5):
        img = rng.randint(0, 256, (256 + 16 * i, 320, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    paths.append(tmp_path / "missing.jpg")
    out, ok = native.decode_jpeg_shortest_batch(paths, 224, 224,
                                                threads=3, scaled=False)
    assert list(ok) == [1] * 5 + [0]
    assert out.shape == (6, 224, 224, 3)
    for i in range(5):
        single = native.decode_jpeg_shortest(paths[i], 224, crop=224, scaled=False)
        np.testing.assert_array_equal(out[i], single)

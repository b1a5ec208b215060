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


def test_jpeg_shortest_bytes_matches_file_path(tmp_path):
    # the in-memory entry (serving requests are bytes) must produce the
    # exact same pixels as the file entry: same decode, same resize, same
    # crop — only the libjpeg source differs (jpeg_mem_src vs stdio)
    from PIL import Image

    rng = np.random.RandomState(7)
    for shape in ((480, 640), (257, 198), (900, 300)):
        img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        p = tmp_path / f"{shape[0]}x{shape[1]}.jpg"
        Image.fromarray(img).save(p, quality=92)
        data = p.read_bytes()
        for scaled in (False, True):
            from_file = native.decode_jpeg_shortest(p, 224, crop=224,
                                                    scaled=scaled)
            from_mem = native.decode_jpeg_shortest_bytes(data, 224, crop=224,
                                                         scaled=scaled)
            assert np.array_equal(from_file, from_mem)


def test_jpeg_shortest_bytes_rejects_non_jpeg(tmp_path):
    from io import BytesIO

    from PIL import Image

    # PNG payload (valid image, wrong codec): None — caller falls back
    buf = BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, "PNG")
    assert native.decode_jpeg_shortest_bytes(buf.getvalue(), 224,
                                             crop=224) is None
    # truncated/garbage JPEG magic: None, no crash across the FFI boundary
    assert native.decode_jpeg_shortest_bytes(b"\xff\xd8\xffgarbage", 224,
                                             crop=224) is None
    assert native.decode_jpeg_shortest_bytes(b"", 224, crop=224) is None
    with pytest.raises(ValueError):
        native.decode_jpeg_shortest_bytes(b"\xff\xd8\xff", 224, crop=0)


def test_eval_frame_from_bytes_fast_path(tmp_path):
    # fast=True routes through the native DCT-scaled decode; fast=False is
    # the PIL-exact default.  Both must agree closely on a smooth image,
    # and a PNG payload must work under fast=True via the fallback.
    from io import BytesIO

    from PIL import Image

    from avtubes.data.transforms import eval_frame_from_bytes

    yy, xx = np.mgrid[0:512, 0:768]
    img = np.stack([(yy // 2) % 256, (xx // 3) % 256,
                    ((yy + xx) // 4) % 256], -1).astype(np.uint8)
    buf = BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    data = buf.getvalue()
    exact = eval_frame_from_bytes(data, 224)
    fast = eval_frame_from_bytes(data, 224, fast=True)
    assert exact.shape == fast.shape == (224, 224, 3)
    assert np.abs(exact.astype(int) - fast.astype(int)).mean() < 4.0
    assert np.array_equal(
        fast, native.decode_jpeg_shortest_bytes(data, 224, crop=224,
                                                scaled=True))
    png = BytesIO()
    Image.fromarray(img).save(png, "PNG")
    assert np.array_equal(eval_frame_from_bytes(png.getvalue(), 224,
                                                fast=True),
                          eval_frame_from_bytes(png.getvalue(), 224))


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


def test_native_spectrogram_matches_numpy():
    """C++ real-FFT log-spectrogram == numpy f32 path within 2 int16 LSB
    (2.5e-4 float; both feed the 'spec_int16' transport)."""
    from avtubes.data.spectrogram import (
        SpectrogramConfig,
        log_spectrogram_np_f32,
        quantize_int16_spectrogram,
    )

    cfg = SpectrogramConfig(samplerate=22050, seconds=2)
    rng = np.random.RandomState(0)
    wav = np.clip(rng.randn(cfg.num_samples) * 0.3, -1, 1).astype(np.float32)
    ref = quantize_int16_spectrogram(log_spectrogram_np_f32(wav, cfg))
    out = native.log_spectrogram_i16(wav, cfg.samplerate, cfg.nperseg,
                                     cfg.noverlap, cfg.num_freqs, cfg.num_frames)
    assert out is not None and out.shape == cfg.shape and out.dtype == np.int16
    assert np.abs(out.astype(np.int32) - ref.astype(np.int32)).max() <= 2


def test_native_spectrogram_rejects_non_pow2():
    assert native.log_spectrogram_i16(np.zeros(4096, np.float32), 16000,
                                      500, 1, 251, 8) is None


def test_decode_wav_spec_batch(tmp_path):
    """Fused decode+prepare+STFT batch == per-sample decode -> numpy STFT."""
    from avtubes.data.spectrogram import (
        SpectrogramConfig,
        log_spectrogram_np_f32,
        quantize_int16_spectrogram,
    )

    cfg = SpectrogramConfig(samplerate=8000, seconds=1)
    rng = np.random.RandomState(1)
    paths = []
    wavs = []
    for i in range(3):
        w = np.clip(rng.randn(8000 if i != 1 else 3000) * 0.4, -1, 1).astype(np.float32)
        p = tmp_path / f"w{i}.wav"
        write_wav(p, w, 8000)
        paths.append(p)
        wavs.append(w)
    paths.append(tmp_path / "missing.wav")
    out, rates = native.decode_wav_spec_batch(
        paths, 1, 8000, cfg.samplerate, cfg.nperseg, cfg.noverlap,
        cfg.num_freqs, cfg.num_frames, threads=2)
    assert rates.tolist()[:3] == [8000, 8000, 8000] and rates[3] == 0
    for i, _ in enumerate(wavs):
        # reference path reads the file back (PCM16 write quantizes)
        w, sr = read_wav(paths[i])
        prepared = np.asarray(prepare_waveform(w, sr, 1), np.float32)[:8000]
        if prepared.shape[0] < 8000:
            prepared = np.pad(prepared, (0, 8000 - prepared.shape[0]))
        ref = quantize_int16_spectrogram(log_spectrogram_np_f32(prepared, cfg))
        assert np.abs(out[i].astype(np.int32) - ref.astype(np.int32)).max() <= 2


def test_decode_clip_train_matches_per_frame_path(tmp_path):
    """Fused clip decode == the per-frame decode+shared-crop path, frame for
    frame (same crop window, same resize), incl. the rng draw sequence."""
    from PIL import Image

    from avtubes.data.transforms import host_load_train_clip

    rng_img = np.random.RandomState(0)
    paths = []
    for i in range(4):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng_img.randint(0, 256, (120, 160, 3), np.uint8)).save(
            p, quality=92)
        paths.append(p)

    fused = host_load_train_clip(paths, np.random.RandomState(7), 96)
    # force the per-frame path: make the fused call decline so the loader
    # falls through (the drawn crop must be reused, not re-drawn)
    import avtubes.native as native_mod

    orig = native_mod.decode_clip_train
    native_mod.decode_clip_train = lambda *a, **k: None  # fused declines
    try:
        per_frame = host_load_train_clip(paths, np.random.RandomState(7), 96)
    finally:
        native_mod.decode_clip_train = orig
    assert fused.shape == per_frame.shape == (4, 96, 96, 3)
    np.testing.assert_array_equal(fused, per_frame)


def test_decode_clip_train_geometry_mismatch_fails_not_zerofills(tmp_path):
    """A clip whose frames change aspect ratio mid-clip (corrupt source) can
    draw a frame-0 crop window that a later frame's resized extent doesn't
    cover.  The fused path must FAIL that frame (return None -> per-frame
    fallback raises -> sample skip-and-counted), never silently train on
    zero-padded black borders."""
    from PIL import Image

    rng_img = np.random.RandomState(3)
    paths = []
    # frame 0: tall 480x120 -> resized (w=106 short side) h~424: crop rows
    # can be drawn far down; frame 1: square 120x120 -> resized 106x106
    for i, (h, w) in enumerate([(480, 120), (120, 120), (480, 120), (480, 120)]):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng_img.randint(0, 256, (h, w, 3), np.uint8)).save(
            p, quality=92)
        paths.append(p)

    # crop drawn beyond frame 1's 106-row extent: top=200
    out = native.decode_clip_train(paths, 106, 96, 200, 5, scaled=True)
    assert out is None  # frame 1 failed -> good != n -> decline

    # a window every frame covers still succeeds
    out = native.decode_clip_train(paths, 106, 96, 5, 5, scaled=True)
    assert out is not None and out.shape == (4, 96, 96, 3)
    assert out.min() != out.max()  # real pixels, not zero fill


def test_log_spec_i16_rejects_wrong_num_freqs():
    """The C side always writes nperseg//2+1 frequency rows; a caller-supplied
    num_freqs that disagrees (a mel bin count, a stale config) must raise,
    not heap-overflow the int16 allocation."""
    wav = np.zeros(512 + 3 * 511, np.float32)  # 4 frames at hop 511
    with pytest.raises(ValueError, match="frequency"):
        native.log_spectrogram_i16(wav, 22050, 512, 1, num_freqs=129,
                                   num_frames=4)


def test_decode_wav_spec_batch_rejects_wrong_num_freqs(tmp_path):
    with pytest.raises(ValueError, match="frequency"):
        native.decode_wav_spec_batch([tmp_path / "x.wav"], seconds=1,
                                     wav_len=512 + 511, samplerate=22050,
                                     nperseg=512, noverlap=1,
                                     num_freqs=129, num_frames=2)


# --- corrupt / adversarial input guards (untrusted header fields) ---------


def _wav_bytes(n_samples=256, sr=8000, fmt_size=16, data_size=None,
               extra_chunk=None):
    """Hand-rolled 16-bit mono RIFF/WAVE so header fields can lie."""
    import struct

    pcm = (np.zeros(n_samples, np.int16)).tobytes()
    if data_size is None:
        data_size = len(pcm)
    fmt_body = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)[:max(fmt_size, 0)]
    body = b"fmt " + struct.pack("<I", fmt_size) + fmt_body
    if extra_chunk is not None:
        body += extra_chunk
    body += b"data" + struct.pack("<I", data_size) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_valid_handroll_decodes(tmp_path):
    """Sanity: the hand-rolled WAV builder produces a file the reader accepts
    (so the corrupt-variant tests below fail for the corruption, not the
    scaffolding)."""
    p = tmp_path / "ok.wav"
    p.write_bytes(_wav_bytes())
    got = native.decode_wav_prepared(p, 1, 8000)
    assert got is not None and got[1] == 8000


def test_wav_lying_chunk_size_clamped_to_file(tmp_path):
    """A chunk whose 32-bit size field exceeds the file is CLAMPED to the
    bytes actually present — streamed writers (ffmpeg to a pipe) leave
    placeholder/overstated sizes, and those files must keep decoding —
    while never allocating from the lie (a 0xFFFFFFF0 'data' size would
    otherwise drive a ~4 GB vector resize inside a decode worker thread)."""
    truth = tmp_path / "truth.wav"
    truth.write_bytes(_wav_bytes())
    liar = tmp_path / "liar.wav"
    liar.write_bytes(_wav_bytes(data_size=0xFFFFFFF0))
    ref = native.decode_wav_prepared(truth, 1, 8000)
    got = native.decode_wav_prepared(liar, 1, 8000)
    assert got is not None and got[1] == ref[1]
    np.testing.assert_array_equal(got[0], ref[0])
    # and via the threaded batch APIs: decodes, process survives
    out, rates = native.decode_wav_batch([liar, liar], 1, 8000, threads=2)
    assert list(rates) == [8000, 8000]


def test_wav_truncated_fmt_chunk_fails_cleanly(tmp_path):
    """fmt chunks shorter than the 16 bytes the parser reads must be
    rejected, not read past the buffer."""
    p = tmp_path / "shortfmt.wav"
    p.write_bytes(_wav_bytes(fmt_size=8))
    assert native.decode_wav_prepared(p, 1, 8000) is None


def test_wav_garbage_in_spec_batch(tmp_path):
    """The fused decode+spectrogram batch path shares read_wav_file; an
    unreadable file must surface as rate 0 for that item only."""
    good = tmp_path / "good.wav"
    sr = 22050
    write_wav(good, np.zeros(sr, np.float64), sr)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFgarbage-not-a-wave-file")
    nperseg, noverlap, seconds = 512, 1, 1
    wav_len = sr * seconds
    frames = (wav_len - noverlap) // (nperseg - noverlap)
    res = native.decode_wav_spec_batch(
        [good, bad], seconds=seconds, wav_len=wav_len, samplerate=sr,
        nperseg=nperseg, noverlap=noverlap,
        num_freqs=nperseg // 2 + 1, num_frames=frames)
    assert res is not None
    _, rates = res
    assert rates[0] == sr and rates[1] == 0


def _giant_sof_jpeg(tmp_path, h=30000, w=30000):
    """A real JPEG whose SOF0 dims are patched to claim h x w (~0.9 GP):
    tiny on disk, would decode to h*w*3 bytes."""
    import struct

    from PIL import Image

    p = tmp_path / "giant.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p, quality=90)
    raw = bytearray(p.read_bytes())
    i = raw.find(b"\xff\xc0")  # baseline SOF0: marker len prec H H W W
    assert i >= 0
    raw[i + 5:i + 9] = struct.pack(">HH", h, w)
    p.write_bytes(bytes(raw))
    return p


def test_giant_jpeg_header_rejected(tmp_path):
    """Crafted 100+ MP header dims must be declined everywhere a buffer
    would be sized from them — not allocated (Python) or decoded (C++)."""
    p = _giant_sof_jpeg(tmp_path)
    assert native.jpeg_size(p) == (30000, 30000)  # header parses...
    assert native.decode_jpeg(p) is None          # ...but decode declines
    assert native.decode_jpeg_shortest(p, 256, crop=224) is None
    out, ok = native.decode_jpeg_shortest_batch([p], 256, 224, threads=2)
    assert list(ok) == [0]


def test_extreme_aspect_jpeg_header_rejected(tmp_path):
    """A 2x30000 SOF claim passes the 100 MP *source* cap but its
    shortest-side resize target (224 x 3.36M) would be gigabytes — the
    target-dims cap must decline it in every decode path."""
    p = _giant_sof_jpeg(tmp_path, h=2, w=30000)
    assert native.decode_jpeg_shortest(p, 224, crop=224) is None
    assert native.decode_jpeg_shortest(p, 224, crop=0) is None  # py-side cap
    out, ok = native.decode_jpeg_shortest_batch([p], 224, 224, threads=2)
    assert list(ok) == [0]
    assert native.decode_clip_train([p, p], 224, 64, 0, 0, threads=2) is None


def test_extreme_geometry_decode_matches_pil(tmp_path):
    """Degenerate source geometries through the fused decode+resize paths:
    1-pixel-tall/wide images and upscaling (short_side > source) exercise
    the max(1, round()) dim floors and cubic border clamps."""
    from PIL import Image

    rng = np.random.RandomState(5)
    cases = [(1, 1), (1, 64), (64, 1), (3, 97), (16, 16)]
    for i, (h, w) in enumerate(cases):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"g{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        for short in (8, 48):  # down- and up-scaling
            ours = native.decode_jpeg_shortest(p, short, crop=0, scaled=False)
            assert ours is not None, (h, w, short)
            ref_img = Image.open(p).convert("RGB")
            rh, rw = native.shortest_side_dims(h, w, short)
            ref = np.asarray(ref_img.resize((rw, rh), Image.BICUBIC))
            assert ours.shape == ref.shape, (h, w, short)
            diff = np.abs(ours.astype(int) - ref.astype(int))
            assert diff.max() <= 1, (h, w, short, diff.max())
        # center-crop larger than the resized extent: zero-padded border
        cropped = native.decode_jpeg_shortest(p, 8, crop=32, scaled=False)
        assert cropped is not None and cropped.shape == (32, 32, 3)

"""ctypes bindings for the native IO core (libavtubes_io.so).

Builds on first use if the shared library is missing (g++ + libjpeg are part
of the toolchain); every entry point has a pure-Python fallback in
avtubes.data, so the framework degrades gracefully without a compiler.
Set AVTUBES_NO_NATIVE=1 to force the Python fallbacks (debugging a decode
discrepancy, platforms without a toolchain, A/B parity runs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libavtubes_io.so"
_lock = threading.Lock()
_lib = None
_tried = False


def shortest_side_dims(h: int, w: int, target: int) -> tuple[int, int]:
    """(rh, rw) of a shortest-side resize to `target`.  Python round() is
    half-to-even, matching the C++ side's std::nearbyint (`shortest_dims`
    in avtubes_io.cc) — the two copies MUST stay in lockstep or buffer
    sizes disagree at exact .5 ties (tests/test_native.py pins a tie)."""
    if w < h:
        return max(1, round(h * target / w)), target
    return target, max(1, round(w * target / h))


def _build() -> bool:
    # cross-PROCESS serialization (the threading.Lock in get_lib covers only
    # this process): multi-process trainers all hit build-on-first-use on a
    # fresh checkout; an fcntl lock makes the peers wait for one builder
    # (the Makefile additionally compiles to a temp + atomic rename, so even
    # an unlocked concurrent reader never maps a half-written .so)
    try:
        import fcntl

        with open(_DIR / ".build.lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            src = _DIR / "avtubes_io.cc"
            if (_LIB_PATH.exists() and src.exists()
                    and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime):
                return True  # a peer built it while this process waited
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:
        print(f"[native] build failed ({e}); using Python IO fallbacks")
        return False


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        if os.environ.get("AVTUBES_NO_NATIVE"):
            _tried = True  # force the Python fallbacks for this process
            return None
        _tried = True
        src = _DIR / "avtubes_io.cc"
        # src may be absent in a pruned/packaged install with only the .so
        stale = (_LIB_PATH.exists() and src.exists()
                 and _LIB_PATH.stat().st_mtime < src.stat().st_mtime)
        if (not _LIB_PATH.exists() or stale) and not _build():
            if not _LIB_PATH.exists():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            print(f"[native] load failed ({e}); using Python IO fallbacks")
            return None
        # a pre-existing .so from an older source revision (stale build that
        # could not be rebuilt) may lack newer symbols — treat it as
        # unavailable rather than raising AttributeError out of available()
        try:
            _bind(lib)
        except AttributeError as e:
            print(f"[native] stale library missing symbol ({e}); "
                  "using Python IO fallbacks")
            return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    lib.avt_decode_wav.restype = ctypes.c_int
    lib.avt_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.avt_decode_wav_batch.restype = None
    lib.avt_decode_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.avt_jpeg_size.restype = ctypes.c_int
    lib.avt_jpeg_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.avt_decode_jpeg.restype = ctypes.c_int
    lib.avt_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int]
    lib.avt_decode_jpeg_shortest.restype = ctypes.c_int
    lib.avt_decode_jpeg_shortest.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.avt_decode_jpeg_shortest_mem.restype = ctypes.c_int
    lib.avt_decode_jpeg_shortest_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,  # c_char_p: zero-copy bytes pass
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.avt_decode_jpeg_shortest_batch.restype = None
    lib.avt_decode_jpeg_shortest_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
    lib.avt_decode_jpeg_batch.restype = None
    lib.avt_decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.avt_decode_clip_train.restype = ctypes.c_int
    lib.avt_decode_clip_train.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.avt_log_spec_i16.restype = ctypes.c_int
    lib.avt_log_spec_i16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int16)]
    lib.avt_decode_wav_spec_batch.restype = None
    lib.avt_decode_wav_spec_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]


def available() -> bool:
    return get_lib() is not None


def decode_wav_prepared(path: str | Path, seconds: int,
                        out_len: int) -> tuple[np.ndarray, int] | None:
    """Decode + prepare one WAV into a fixed float32 buffer; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(out_len, np.float32)
    sr = lib.avt_decode_wav(str(path).encode(), seconds,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            out_len)
    if sr == 0:
        return None
    return out, sr


def decode_wav_batch(paths: list[str | Path], seconds: int, out_len: int,
                     threads: int = 8) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded batch decode+prepare -> ((n, out_len) float32, (n,) rates)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_len), np.float32)
    rates = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.avt_decode_wav_batch(
        arr, n, seconds, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_len, rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads)
    return out, rates


def decode_clip_train(paths: list[str | Path], short_side: int, crop: int,
                      top: int, left: int, threads: int = 1,
                      scaled: bool = True) -> np.ndarray | None:
    """Fused training-clip decode: every frame -> decode + shortest-side
    bicubic resize + the SAME (top, left) crop window, one C++ call, output
    (n, crop, crop, 3) uint8.  None when the library is unavailable or any
    frame fails (caller falls back to the per-frame Python path)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, crop, crop, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    good = lib.avt_decode_clip_train(
        arr, n, short_side, crop, top, left,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads,
        int(scaled))
    return out if good == n else None


def log_spectrogram_i16(wav: np.ndarray, samplerate: int, nperseg: int,
                        noverlap: int, num_freqs: int,
                        num_frames: int) -> np.ndarray | None:
    """Native log-spectrogram of a prepared f32 waveform -> (F, T) int16
    (spec_int16 transport payload; scale = SPEC_INT16_SCALE).  None when the
    library is unavailable or nperseg isn't a power of two — callers fall
    back to the numpy path (`log_spectrogram_np_f32` + quantize)."""
    lib = get_lib()
    if lib is None:
        return None
    wav = np.ascontiguousarray(wav, np.float32)
    # the C side derives the frame count from the waveform length and writes
    # that many columns — an unprepared (longer) waveform would run past the
    # allocation below.  Fail loudly instead: a length mismatch is a caller
    # bug (waveforms must be prepared to cfg.num_samples first).
    hop = nperseg - noverlap
    derived = (wav.shape[0] - nperseg) // hop + 1 if hop > 0 else -1
    if derived != num_frames:
        raise ValueError(
            f"waveform length {wav.shape[0]} yields {derived} STFT frames, "
            f"but the output is allocated for {num_frames}; prepare the "
            "waveform to the configured num_samples first")
    if num_freqs != nperseg // 2 + 1:
        raise ValueError(
            f"the C side writes nperseg//2+1 = {nperseg // 2 + 1} frequency "
            f"rows, but the output is allocated for {num_freqs}")
    out = np.empty((num_freqs, num_frames), np.int16)
    ok = lib.avt_log_spec_i16(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), wav.shape[0],
        samplerate, nperseg, noverlap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out if ok else None


def decode_wav_spec_batch(paths: list[str | Path], seconds: int, wav_len: int,
                          samplerate: int, nperseg: int, noverlap: int,
                          num_freqs: int, num_frames: int, threads: int = 8
                          ) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused threaded batch: WAV decode + prepare + log-spectrogram ->
    ((n, F, T) int16, (n,) rates; rate 0 = failed)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    hop = nperseg - noverlap
    derived = (wav_len - nperseg) // hop + 1 if hop > 0 else -1
    if derived != num_frames:
        raise ValueError(
            f"wav_len {wav_len} yields {derived} STFT frames, but the "
            f"output is allocated for {num_frames}")
    if num_freqs != nperseg // 2 + 1:
        raise ValueError(
            f"the C side writes nperseg//2+1 = {nperseg // 2 + 1} frequency "
            f"rows, but the output is allocated for {num_freqs}")
    out = np.empty((n, num_freqs, num_frames), np.int16)
    rates = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.avt_decode_wav_spec_batch(
        arr, n, seconds, wav_len, samplerate, nperseg, noverlap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads)
    return out, rates


def jpeg_size(path: str | Path) -> tuple[int, int] | None:
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if not lib.avt_jpeg_size(str(path).encode(), ctypes.byref(h), ctypes.byref(w)):
        return None
    return h.value, w.value


def decode_jpeg(path: str | Path) -> np.ndarray | None:
    """Decode one JPEG to (H, W, 3) RGB uint8; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    size = jpeg_size(path)
    if size is None:
        return None
    h, w = size
    if h * w > 100_000_000:  # untrusted header dims (same cap as the C++
        return None  # decode_jpeg_to guard): don't allocate gigabytes
    out = np.empty((h, w, 3), np.uint8)
    if not lib.avt_decode_jpeg(str(path).encode(),
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                               h, w):
        return None
    return out


def decode_jpeg_shortest(path: str | Path, short_side: int,
                         crop: int = 0, scaled: bool = True) -> np.ndarray | None:
    """Fused decode + PIL-compatible shortest-side bicubic resize
    (+ center crop to (crop, crop) when crop > 0).  None on failure.

    This replaces decode-then-PIL-resize in the hot eval/train load path:
    the resize runs in C++ on the decode thread (no GIL, no PIL churn).
    scaled=True additionally lets libjpeg's DCT-domain M/8 scaling do most
    of the downscale (2.6x faster end to end; pixel values drift ~2 levels
    vs PIL bicubic — the PIL Image.draft tradeoff); scaled=False is
    bit-comparable to the PIL path.
    """
    lib = get_lib()
    if lib is None:
        return None
    if crop > 0:
        out = np.empty((crop, crop, 3), np.uint8)
    else:
        size = jpeg_size(path)
        if size is None:
            return None
        h, w = size
        rh, rw = shortest_side_dims(h, w, short_side)
        if h * w > 100_000_000 or rh * rw > 100_000_000:
            return None  # untrusted header dims / extreme aspect ratio
        out = np.empty((rh, rw, 3), np.uint8)
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    if not lib.avt_decode_jpeg_shortest(
            str(path).encode(), short_side, crop,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(oh), ctypes.byref(ow), int(scaled)):
        return None
    return out


def decode_jpeg_shortest_bytes(data: bytes, short_side: int, crop: int,
                               scaled: bool = False) -> np.ndarray | None:
    """`decode_jpeg_shortest` over an IN-MEMORY JPEG (serving requests are
    bytes, not files) -> (crop, crop, 3) uint8, or None on failure / non-JPEG
    payload / native lib unavailable — callers fall back to the PIL path,
    which computes the identical transform (and handles PNG etc.).

    crop > 0 is required: the serving path always center-crops to the model's
    input size, so the variable-size output plumbing isn't needed here.
    scaled defaults to False (full-res decode, bit-comparable to PIL) —
    serving outputs are parity-grade like eval, not the training fast path.
    """
    if crop <= 0:
        raise ValueError("decode_jpeg_shortest_bytes requires crop > 0")
    if len(data) < 3 or data[:3] != b"\xff\xd8\xff":  # not a JPEG (e.g. PNG)
        return None
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((crop, crop, 3), np.uint8)
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    if not lib.avt_decode_jpeg_shortest_mem(
            data, len(data), short_side, crop,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(oh), ctypes.byref(ow), int(scaled)):
        return None
    return out


def decode_jpeg_shortest_batch(paths: list[str | Path], short_side: int,
                               crop: int, threads: int = 8, scaled: bool = True
                               ) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded fused decode+resize+center-crop -> ((n,crop,crop,3), ok).

    crop must be > 0: the batch layout is (n, crop, crop, 3), so the
    variable-size crop==0 mode of the single-image API has no batch form.
    """
    if crop <= 0:
        raise ValueError("decode_jpeg_shortest_batch requires crop > 0 "
                         "(use decode_jpeg_shortest for variable-size output)")
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, crop, crop, 3), np.uint8)
    ok = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.avt_decode_jpeg_shortest_batch(
        arr, n, short_side, crop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads, int(scaled))
    return out, ok


def decode_jpeg_batch(paths: list[str | Path], h: int, w: int,
                      threads: int = 8) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded decode of same-size JPEGs -> ((n,h,w,3) uint8, (n,) ok flags)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    ok = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.avt_decode_jpeg_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads)
    return out, ok

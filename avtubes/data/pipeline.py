"""Host input pipeline: dataset sources, threaded decode, device prefetch.

Equivalents of the reference's three torch Datasets
(`/root/reference/datasets/dataloader.py`):

  * ClipTrainSource    ~ SubSampledFlickr   — pre-extracted JPEG clips
                         `videos/<id>/{0..T-1}.jpg` + `audio/<id>.wav`
  * HardwayTestSource  ~ GetAudioVideoDataset — single `frames/<id>.jpg`
                         + `audio/<id>.wav` (the 249-image hard-way test)
  * PerFrameEvalSource ~ PerFrameLabels     — full `videos/<id>.mp4` decode
                         (cv2), every frame, batch size 1

Design differences (deliberate):
  * decode failures are skipped and counted, not silently replaced with the
    previous video (`dataloader.py:348-361` anti-pattern);
  * the heavy per-sample work (spectrogram, augmentation) happens on device
    in batch — sources emit raw uint8 frames + float32 waveforms;
  * `BatchLoader` is a thread-pool prefetch loop (numpy, zero torch);
    `device_prefetch` keeps `depth` batches in flight on the accelerator so
    the H2D copy overlaps the previous step's compute.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Any, Callable, Iterator

import numpy as np

from avtubes.core.config import DataConfig
from avtubes.data.audio import prepare_waveform, read_wav
from avtubes.data.transforms import host_eval_clip, host_load_eval_frame, host_load_train_clip


class SkippedSampleError(Exception):
    """Raised by sources for undecodable samples; the loader skips + counts."""


def load_prepared_wav(path, cfg: DataConfig) -> np.ndarray:
    """Decode + prepare a WAV to exactly samplerate*seconds float32 samples.

    Prefers the native C++ decoder (avtubes.native: threaded RIFF parse +
    downmix/tile/clip into the fixed buffer); falls back to the numpy path.
    Files whose samplerate differs from the dataset's nominal rate are
    zero-padded/truncated to the nominal length so batches stay rectangular.

    The result then goes through the audio transport policy
    (`_finalize_waveform`): int16 PCM by default, or a host-computed int16
    log-spectrogram under cfg.audio_transport='spec_int16'.
    """
    target = cfg.samplerate * cfg.audio_seconds
    wav = None
    try:
        from avtubes import native

        if native.available():
            out = native.decode_wav_prepared(path, cfg.audio_seconds, target)
            if out is None:
                raise SkippedSampleError(f"{path}: native WAV decode failed")
            wav = out[0]
    except ImportError:
        pass
    if wav is None:
        wav = _python_prepared_wav(path, cfg)
    return _finalize_waveform(wav, cfg)


def _python_prepared_wav(path, cfg: DataConfig) -> np.ndarray:
    """Pure-Python decode+prepare to exactly target float32 samples."""
    target = cfg.samplerate * cfg.audio_seconds
    samples, sr = read_wav(path)
    wav = prepare_waveform(samples, sr, cfg.audio_seconds).astype(np.float32)
    if wav.shape[0] < target:
        wav = np.pad(wav, (0, target - wav.shape[0]))
    return wav[:target]


def _finalize_waveform(wav: np.ndarray, cfg: DataConfig) -> np.ndarray:
    """Apply the audio transport policy (cfg.audio_transport).

    'float32'    raw waveform unchanged;
    'int16'      PCM16 quantization (exact inverse of the reader's /32768 —
                 bit-lossless for 16-bit sources, half the bytes);
    'spec_int16' host-computed log-spectrogram as int16 fixed point (~3e-5
                 quantization, half the bytes again).  The batch still
                 travels under the "waveform" key; `log_spectrogram`'s
                 static-shape passthrough dequantizes on device, so every
                 consumer works with either transport;
    'spec_int8'  OPT-IN int8 spectrogram (~8e-3 quantization — NOT
                 parity-grade; measured metric deltas in DESIGN.md) for
                 links thin enough that the spectrogram's bytes bind the
                 end-to-end rate.
    """
    if cfg.audio_transport in ("spec_int16", "spec_int8"):
        from avtubes.data.spectrogram import (
            SpectrogramConfig,
            log_spectrogram_np_f32,
            quantize_int16_spectrogram,
            spec_int16_to_int8,
        )

        to_int8 = cfg.audio_transport == "spec_int8"
        spec_cfg = SpectrogramConfig(samplerate=cfg.samplerate,
                                     seconds=cfg.audio_seconds)
        out = None
        try:  # native C++ real-FFT (~2x the numpy path per core, no GIL)
            from avtubes import native

            if native.available():
                out = native.log_spectrogram_i16(
                    wav, spec_cfg.samplerate, spec_cfg.nperseg,
                    spec_cfg.noverlap, spec_cfg.num_freqs, spec_cfg.num_frames)
        except ImportError:
            pass
        if out is None:
            out = quantize_int16_spectrogram(
                log_spectrogram_np_f32(wav, spec_cfg))
        return spec_int16_to_int8(out) if to_int8 else out
    if cfg.audio_transport == "int16":
        from avtubes.data.spectrogram import quantize_int16_waveform

        return quantize_int16_waveform(wav)
    return wav


class ClipTrainSource:
    """Training clips: `videos/<id>/{i}.jpg` frames + `audio/<id>.wav`."""

    def __init__(self, root: str | Path, ids: list[str], cfg: DataConfig):
        self.root = Path(root)
        self.ids = ids
        self.cfg = cfg

    def __len__(self) -> int:
        return len(self.ids)

    def load(self, idx: int, rng: np.random.RandomState) -> dict[str, Any]:
        vid = self.ids[idx]
        frame_dir = self.root / "videos" / vid
        t = self.cfg.frame_density
        try:
            if t < 2:  # middle-frame mode (`dataloader.py:257-258`)
                paths = [frame_dir / "8.jpg"]
            else:
                paths = [frame_dir / f"{i}.jpg" for i in range(t)]
            clip = host_load_train_clip(paths, rng, self.cfg.image_size,
                                        threads=self.cfg.clip_decode_threads)
            wav = load_prepared_wav(self.root / "audio" / f"{vid}.wav", self.cfg)
        except (OSError, ValueError) as e:
            raise SkippedSampleError(f"{vid}: {e}") from e
        return {"clip": clip, "waveform": wav, "id": vid}


class HardwayTestSource:
    """Hard-way test: one `frames/<id>.jpg` + `audio/<id>.wav` per id."""

    def __init__(self, root: str | Path, ids: list[str], cfg: DataConfig):
        self.root = Path(root)
        self.ids = ids
        self.cfg = cfg

    def __len__(self) -> int:
        return len(self.ids)

    def load(self, idx: int, rng=None) -> dict[str, Any]:
        vid = self.ids[idx]
        try:
            frame = host_load_eval_frame(self.root / "frames" / f"{vid}.jpg",
                                         self.cfg.image_size)
            wav = load_prepared_wav(self.root / "audio" / f"{vid}.wav", self.cfg)
        except (OSError, ValueError) as e:
            raise SkippedSampleError(f"{vid}: {e}") from e
        return {"frame": frame, "waveform": wav, "id": vid}


class BatchedHardwayLoader:
    """Batch-granular native decode for the hard-way test set.

    One C++ call decodes every JPEG of a batch (fused decode + PIL-parity
    resize + center crop, internal thread pool) and one decodes every WAV.
    Same skip-and-count semantics as `BatchLoader` (failed samples are
    dropped from the batch and counted); byte-identical output
    (tests/test_pipeline.py pins it).

    Mode choice is transport-dependent (1-core host measurements):
    waveform transports — per-sample wins (198 vs 184 clips/s host-only;
    eager decode-ahead workers overlap H2D staging better);
    'spec_int16' — batched wins decisively (201 vs 151 host-only, 85 vs 69
    clips/s end-to-end): the fused decode+prepare+STFT C++ call never
    re-enters Python between stages and leaves the whole core to the
    transfer thread between batches.  `make_hardway_loader` picks the
    measured winner per transport; many-core hosts additionally scale the
    internal C++ thread pool past the GIL.
    """

    def __init__(self, root: str | Path, ids: list[str], cfg: DataConfig,
                 batch_size: int, threads: int | None = None):
        self.root = Path(root)
        self.ids = ids
        self.cfg = cfg
        self.batch_size = batch_size
        self.threads = threads or max(2, cfg.n_threads)
        self.skipped = 0
        self.epoch_skipped = 0

    def __len__(self) -> int:
        return -(-len(self.ids) // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict[str, Any]]:
        from avtubes import native

        self.epoch_skipped = 0
        cfg = self.cfg
        target = cfg.samplerate * cfg.audio_seconds
        spec_transport = cfg.audio_transport in ("spec_int16", "spec_int8")
        if spec_transport:
            from avtubes.data.spectrogram import SpectrogramConfig

            sc = SpectrogramConfig(samplerate=cfg.samplerate,
                                   seconds=cfg.audio_seconds)
        for lo in range(0, len(self.ids), self.batch_size):
            vids = self.ids[lo : lo + self.batch_size]
            fpaths = [self.root / "frames" / f"{v}.jpg" for v in vids]
            wpaths = [self.root / "audio" / f"{v}.wav" for v in vids]
            frames, fok = native.decode_jpeg_shortest_batch(
                fpaths, cfg.image_size, cfg.image_size,
                threads=self.threads, scaled=False)  # eval: parity-grade
            if spec_transport:
                # fused C++ decode+prepare+STFT: the waveform never crosses
                # back into Python; payload is the (F, T) int16 spectrogram
                waves, rates = native.decode_wav_spec_batch(
                    wpaths, cfg.audio_seconds, target, sc.samplerate,
                    sc.nperseg, sc.noverlap, sc.num_freqs, sc.num_frames,
                    threads=self.threads)
                if cfg.audio_transport == "spec_int8":
                    from avtubes.data.spectrogram import spec_int16_to_int8

                    waves = spec_int16_to_int8(waves)
            else:
                waves, rates = native.decode_wav_batch(
                    wpaths, cfg.audio_seconds, target, threads=self.threads)
            ok = (fok == 1) & (rates > 0)
            # native-failure fallback: retry through the Python path (PIL
            # decodes some files libjpeg rejects, e.g. CMYK JPEGs) so both
            # loader modes score the same sample set
            for i in np.nonzero(~ok)[0]:
                try:
                    if fok[i] != 1:
                        # host_load_eval_frame falls through to PIL when
                        # the native decode declines the file
                        frames[i] = host_load_eval_frame(fpaths[i],
                                                         cfg.image_size)
                    if rates[i] <= 0:
                        wav_i = _python_prepared_wav(wpaths[i], cfg)
                        waves[i] = (_finalize_waveform(wav_i, cfg)
                                    if spec_transport else wav_i)
                    ok[i] = True
                except (OSError, ValueError):
                    pass
            n_bad = int((~ok).sum())
            if n_bad:
                self.skipped += n_bad
                self.epoch_skipped += n_bad
                for v, good in zip(vids, ok):
                    if not good:
                        print(f"[loader] epoch {epoch}: skipping sample: {v}")
            if not ok.any():
                continue
            if not n_bad:  # skip the fancy-index copy on the common path
                good_frames, good_waves, good_ids = frames, waves, list(vids)
            else:
                good_frames, good_waves = frames[ok], waves[ok]
                good_ids = [v for v, g in zip(vids, ok) if g]
            yield {"frame": good_frames,
                   # spec payloads are already finalized by the fused C++
                   # call; waveform batches quantize elementwise here
                   "waveform": (good_waves if spec_transport
                                else _finalize_waveform(good_waves, cfg)),
                   "id": good_ids}


def make_hardway_loader(root, ids, cfg: DataConfig, batch_size: int,
                        num_workers: int = 4, mode: str | None = None):
    """Hard-way test loader.

    mode="per_sample": eager decode-ahead worker threads (measured fastest
    for waveform transports on few-core hosts: 198 vs 184 clips/s — Python
    per-sample overhead is small and the workers overlap H2D staging).
    mode="batched": one native C++ call per batch; with
    audio_transport='spec_int16' the batch call fuses decode+prepare+STFT
    so the waveform never re-enters Python — measured 33% faster there
    (201 vs 151 clips/s on the 1-core host), so it is the default for that
    transport.  Override per-run with mode=... or fleet-wide with
    AVTUBES_EVAL_LOADER; batched requires the native library and falls
    back to per-sample."""
    import os

    default = ("batched" if cfg.audio_transport.startswith("spec_int")
               else "per_sample")
    mode = mode or os.environ.get("AVTUBES_EVAL_LOADER", default)
    if mode == "batched":
        try:
            from avtubes import native

            if native.available():
                return BatchedHardwayLoader(root, ids, cfg, batch_size)
        except ImportError:
            pass
    return BatchLoader(HardwayTestSource(root, ids, cfg), batch_size,
                       num_workers=num_workers, shuffle=False, drop_last=False)


class PerFrameEvalSource:
    """Whole-video eval: cv2-decode every frame of `videos/<id>.mp4`."""

    def __init__(self, root: str | Path, ids: list[str], cfg: DataConfig,
                 audio_root: str | Path | None = None):
        self.root = Path(root)
        self.audio_root = Path(audio_root) if audio_root else self.root / "audio"
        self.ids = ids
        self.cfg = cfg

    def __len__(self) -> int:
        return len(self.ids)

    def load(self, idx: int, rng=None) -> dict[str, Any]:
        import cv2

        vid = self.ids[idx]
        path = self.root / "videos" / f"{vid}.mp4"
        cap = cv2.VideoCapture(str(path))
        frames = []
        ok, img = cap.read()
        while ok:
            frames.append(img[:, :, ::-1])  # BGR -> RGB
            ok, img = cap.read()
        cap.release()
        if len(frames) <= 1:
            raise SkippedSampleError(f"{vid}: undecodable or single-frame video")
        clip = host_eval_clip(np.asarray(frames), self.cfg.image_size)
        try:
            wav = load_prepared_wav(self.audio_root / f"{vid}.wav", self.cfg)
        except (OSError, ValueError) as e:
            raise SkippedSampleError(f"{vid}: {e}") from e
        return {"clip": clip, "waveform": wav, "id": vid}


class SyntheticSource:
    """Deterministic random clips + waveforms (tests, smoke runs, bench)."""

    def __init__(self, cfg: DataConfig, n: int = 64, clip: bool = True, seed: int = 0):
        self.cfg = cfg
        self.n = n
        self.clip = clip
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def load(self, idx: int, rng=None) -> dict[str, Any]:
        r = np.random.RandomState(self.seed * 100003 + idx)
        s = self.cfg.image_size
        wav = _finalize_waveform(
            np.clip(r.randn(self.cfg.samplerate * self.cfg.audio_seconds) * 0.1,
                    -1, 1).astype(np.float32), self.cfg)
        if self.clip:
            t = max(self.cfg.frame_density, 1)
            img = r.randint(0, 256, (t, s, s, 3), dtype=np.uint8)
            return {"clip": img, "waveform": wav, "id": f"synthetic_{idx}"}
        img = r.randint(0, 256, (s, s, 3), dtype=np.uint8)
        return {"frame": img, "waveform": wav, "id": f"synthetic_{idx}"}


def _collate(samples: list[dict[str, Any]]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        out[key] = vals if key == "id" else np.stack(vals)
    return out


class BatchLoader:
    """Thread-pool batched loader with skip-and-count error handling."""

    def __init__(self, source, batch_size: int, num_workers: int = 4,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        self.source = source
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.skipped = 0            # total across all epochs
        self.epoch_skipped = 0      # last-started epoch only

    def __len__(self) -> int:
        n = len(self.source)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict[str, Any]]:
        self.epoch_skipped = 0
        order = np.arange(len(self.source))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)

        work: queue.Queue = queue.Queue()
        done: queue.Queue = queue.Queue()
        for pos, idx in enumerate(order):
            work.put((pos, int(idx)))
        stop = object()

        def worker(wid: int):
            while True:
                try:
                    pos, idx = work.get_nowait()
                except queue.Empty:
                    done.put(stop)
                    return
                # per-sample-position rng: the stream is identical for any
                # worker count (unlike torch DataLoader's per-worker seeding)
                rng = np.random.RandomState((self.seed + epoch) * 1_000_003 + pos)
                try:
                    done.put((pos, self.source.load(idx, rng)))
                except SkippedSampleError as e:
                    done.put((pos, e))  # main loop reports + counts
                except BaseException as e:  # noqa: BLE001
                    # anything else is a genuine bug — ship it to the main
                    # loop to RAISE there; a worker dying without posting
                    # would leave the epoch loop blocked in done.get()
                    done.put((pos, e))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for th in threads:
            th.start()

        finished = 0
        buf: list[dict[str, Any]] = []
        pending: dict[int, Any] = {}
        next_pos = 0
        total = len(order)
        while finished < self.num_workers or pending or next_pos < total:
            item = done.get()
            if item is stop:
                finished += 1
                if finished == self.num_workers and next_pos >= total:
                    break
                continue
            pos, sample = item
            pending[pos] = sample
            while next_pos in pending:  # preserve deterministic order
                s = pending.pop(next_pos)
                next_pos += 1
                if isinstance(s, SkippedSampleError):
                    # loud per-occurrence report (the reference prints decode
                    # failures as they happen) + per-epoch count to localize rot
                    self.skipped += 1
                    self.epoch_skipped += 1
                    print(f"[loader] epoch {epoch}: skipping sample: {s}")
                elif isinstance(s, BaseException):
                    raise s  # worker hit a non-skippable bug: fail loudly
                else:
                    buf.append(s)
                if len(buf) == self.batch_size:
                    yield _collate(buf)
                    buf = []
            if next_pos >= total and not pending:
                break
        for th in threads:
            th.join(timeout=5)
        if buf and not self.drop_last:
            yield _collate(buf)


def device_prefetch(iterator: Iterator[dict[str, Any]], depth: int = 2,
                    put: Callable[[Any], Any] | None = None) -> Iterator[dict[str, Any]]:
    """Keep `depth` batches device-resident ahead of the consumer.

    Transfers run on a dedicated thread: `device_put` can block for the
    whole copy on thin links (remote-tunnel hosts), and even where it is
    async, staging from a separate thread overlaps host decode, H2D, and
    device compute instead of serializing them on the consumer thread.
    """
    import jax

    put = put or jax.device_put
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = object()
    abandoned = threading.Event()  # consumer closed the generator early

    def _put(item) -> bool:
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def stage():
        try:
            for batch in iterator:
                if abandoned.is_set():
                    return
                if not _put({k: (put(v) if isinstance(v, np.ndarray) else v)
                             for k, v in batch.items()}):
                    return
        except BaseException as e:  # surface on the consumer thread
            _put(e)
            return
        _put(stop)

    th = threading.Thread(target=stage, daemon=True)
    th.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # unblock + retire the stager even if the consumer broke mid-epoch
        # (e.g. --steps N smoke runs), so staged device batches are released
        abandoned.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        th.join(timeout=5)

"""Serving runtime: batched execution of an exported localizer artifact.

The reference has no serving story (inference lives inside its training
scripts); this is the production path for the exported StableHLO artifact
(`avtubes.core.export`).  Two pieces:

  * `ArtifactRunner` — loads an artifact and executes it at power-of-two
    batch *buckets*: a request batch is zero-padded up to the next bucket
    so the number of distinct compiled programs stays O(log max_batch)
    instead of one per observed batch size (batch-polymorphic artifacts
    still specialize per concrete shape at call time).
  * `MicroBatcher` — a dispatcher thread that coalesces concurrent
    single-sample requests into one device call.  On TPU the dispatch
    round-trip dominates single-sample latency (~30 ms through this
    environment's tunnel, ~10 us of MXU time per clip), so batching 8
    concurrent requests costs the last arrival one batching window and
    saves 7 round-trips.

Plus the mask wire format: run-length encoding of the 224x224 binary
mask, and its bounding box.
"""

from __future__ import annotations

import queue
import threading
import time

import numpy as np

__all__ = [
    "ArtifactRunner",
    "ShardedArtifactRunner",
    "MicroBatcher",
    "mask_to_rle",
    "rle_to_mask",
    "mask_box",
]


# ------------------------------------------------------------- wire format

def mask_to_rle(mask: np.ndarray) -> list[int]:
    """Run lengths of the flattened (row-major) binary mask, alternating
    zero-run / one-run and starting with a zero-run (possibly length 0)."""
    flat = np.asarray(mask, dtype=bool).ravel()
    if flat.size == 0:
        return []
    edges = np.flatnonzero(np.diff(flat)) + 1
    runs = np.diff(np.concatenate(([0], edges, [flat.size])))
    counts = runs.tolist()
    if flat[0]:  # must start with a zero-run
        counts.insert(0, 0)
    return counts


def rle_to_mask(counts: list[int], shape: tuple[int, int]) -> np.ndarray:
    """Inverse of `mask_to_rle`."""
    total = int(np.prod(shape))
    flat = np.zeros(total, dtype=np.float32)
    pos, val = 0, 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1.0
        pos += c
        val ^= 1
    if pos != total:
        raise ValueError(f"RLE covers {pos} pixels, mask has {total}")
    return flat.reshape(shape)


def mask_box(mask: np.ndarray) -> list[int] | None:
    """[x0, y0, x1, y1] bounding box (inclusive) of the mask's nonzero
    pixels, or None for an empty mask."""
    ys, xs = np.nonzero(np.asarray(mask))
    if ys.size == 0:
        return None
    return [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]


# ------------------------------------------------------------- execution

class ArtifactRunner:
    """Executes an exported localizer at power-of-two batch buckets."""

    def __init__(self, blob: bytes, max_batch: int = 8):
        from avtubes.core.export import load_artifact

        self.fn, self.meta = load_artifact(blob)
        self.image_size = int(self.meta["image_size"])
        ns = self.meta.get("num_samples")
        self.num_samples = int(ns) if ns else None
        # audio input contract (derived from the program by load_artifact):
        # 'float32'/'int16' waveforms or 'spec_int16'/'spec_int8' payloads
        self.audio_transport = self.meta["audio_transport"]
        self.audio_shape = tuple(self.meta["audio_shape"])
        self.audio_dtype = np.dtype(self.meta["audio_dtype"])
        self._spec_cfg = None
        if self.meta.get("samplerate") and self.meta.get("seconds"):
            from avtubes.data.spectrogram import SpectrogramConfig

            self._spec_cfg = SpectrogramConfig(
                samplerate=int(self.meta["samplerate"]),
                seconds=int(self.meta["seconds"]))
        fixed = self.meta.get("batch")
        if fixed:
            self.buckets = [int(fixed)]
        else:
            self.buckets = []
            b = 1
            while b < max_batch:
                self.buckets.append(b)
                b *= 2
            self.buckets.append(max_batch)
        self.max_batch = self.buckets[-1]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def warmup(self) -> None:
        """Compile every bucket up front (first-request latency otherwise
        pays the ~seconds-scale XLA compile)."""
        for b in self.buckets:
            self.run(
                np.zeros((b, self.image_size, self.image_size, 3), np.uint8),
                np.zeros((b, *self.audio_shape), self.audio_dtype),
            )

    def prepare_audio(self, waves: np.ndarray) -> np.ndarray:
        """Encode (n, num_samples) float waveforms into the artifact's
        audio transport payload (host-side; no-op for 'float32')."""
        from avtubes.data.spectrogram import prepare_audio_payload

        if self._spec_cfg is None:
            raise ValueError(
                "headerless artifact: export samplerate/seconds unknown, "
                "cannot encode waveforms — pass the transport payload "
                f"directly ({self.audio_shape}, {self.audio_dtype})")
        return prepare_audio_payload(waves, self.audio_transport,
                                     self._spec_cfg)

    def _coerce_audio(self, waves: np.ndarray) -> np.ndarray:
        """Accept either the artifact's wire payload as-is or float
        waveforms (encoded host-side via `prepare_audio`)."""
        waves = np.asarray(waves)
        if waves.shape[1:] == self.audio_shape and waves.dtype == self.audio_dtype:
            return np.ascontiguousarray(waves)
        if (np.issubdtype(waves.dtype, np.floating) and waves.ndim == 2
                and self.num_samples and waves.shape[1] == self.num_samples):
            return self.prepare_audio(waves)
        raise ValueError(
            f"audio batch {waves.shape} {waves.dtype} matches neither the "
            f"artifact's {self.audio_transport!r} payload "
            f"({self.audio_shape}, {self.audio_dtype}) nor "
            f"(n, {self.num_samples}) float waveforms")

    def run(self, frames: np.ndarray, waves: np.ndarray):
        """(n, S, S, 3) uint8 frames + audio -> (masks, heatmaps) as numpy,
        any n >= 1 (padded to a bucket; chunked above max).  Audio is
        either (n, num_samples) float waveforms (encoded host-side to the
        artifact's transport) or the transport payload itself."""
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        waves = self._coerce_audio(waves)
        n = frames.shape[0]
        if n == 0:
            raise ValueError("empty batch")
        if n > self.max_batch:
            parts = [self.run(frames[i : i + self.max_batch],
                              waves[i : i + self.max_batch])
                     for i in range(0, n, self.max_batch)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        b = self._bucket(n)
        if b != n:
            frames = np.concatenate(
                [frames, np.zeros((b - n, *frames.shape[1:]), frames.dtype)])
            waves = np.concatenate(
                [waves, np.zeros((b - n, *waves.shape[1:]), waves.dtype)])
        masks, heatmaps = self.fn(frames, waves)
        return np.asarray(masks)[:n], np.asarray(heatmaps)[:n]


class ShardedArtifactRunner(ArtifactRunner):
    """Data-parallel artifact execution over a device mesh (pod serving).

    The localizer is per-sample independent, so serving scales by batch
    sharding: `shard_map` runs the unmodified single-device program on each
    device's shard of the request batch — no re-export, no collectives,
    throughput ~ chip count.  Batch buckets are rounded up to multiples of
    the mesh size so every shard is equal (the padding rows are the same
    zero-clips `ArtifactRunner.run` already adds); a fixed-batch artifact
    must therefore have batch % n_devices == 0.

    Inputs are placed with an explicit batch sharding before the call so
    the host splits each array straight to its device — not one device
    then an on-fabric redistribute.
    """

    def __init__(self, blob: bytes, max_batch: int = 8, devices=None):
        import jax
        from jax.sharding import PartitionSpec as P

        from avtubes.core.mesh import DATA_AXIS, batch_sharding, make_mesh

        super().__init__(blob, max_batch)
        self.mesh = make_mesh(devices)
        n = int(self.mesh.devices.size)
        fixed = self.meta.get("batch")
        if fixed:
            if int(fixed) % n:
                raise ValueError(
                    f"fixed-batch artifact (batch={fixed}) cannot shard over "
                    f"{n} devices; re-export batch-polymorphic or with a "
                    f"multiple of {n}")
        else:
            top = max(((max_batch + n - 1) // n) * n, n)
            self.buckets, b = [], n
            while b < top:
                self.buckets.append(b)
                b *= 2
            self.buckets.append(top)
            self.max_batch = top

        inner = self.fn  # the single-device program (jitted exported.call)
        shard = P(DATA_AXIS)
        self._sharding = batch_sharding(self.mesh)
        self._sharded_fn = jax.jit(jax.shard_map(
            lambda f, w: inner(f, w), mesh=self.mesh,
            in_specs=(shard, shard), out_specs=(shard, shard)))
        self.fn = self._call

    def _call(self, frames, waves):
        import jax

        return self._sharded_fn(jax.device_put(frames, self._sharding),
                                jax.device_put(waves, self._sharding))


class _Pending:
    __slots__ = ("frame", "wave", "event", "mask", "heatmap", "error",
                 "cancelled")

    def __init__(self, frame, wave):
        self.frame = frame
        self.wave = wave
        self.event = threading.Event()
        self.mask = self.heatmap = self.error = None
        self.cancelled = False


class MicroBatcher:
    """Coalesces concurrent `submit` calls into batched `runner.run` calls.

    The dispatcher blocks for the first request, then drains the queue for
    up to `window_ms` (or until `runner.max_batch` requests are in hand)
    before launching one device call.  Under no concurrency the added
    latency is one window; under load the batch fills instantly.
    """

    def __init__(self, runner: ArtifactRunner, window_ms: float = 5.0):
        self.runner = runner
        self.window_s = float(window_ms) / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "cancelled": 0, "batch_hist": {},
                      "device_ms_total": 0.0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="avtubes-microbatch")
        self._thread.start()

    def submit(self, frame: np.ndarray, wave: np.ndarray,
               timeout: float | None = None):
        """Blocks the calling thread until the batched result is ready.
        Returns (mask, heatmap) for this sample."""
        p = _Pending(frame, wave)
        self._queue.put(p)
        if not p.event.wait(timeout):
            # mark abandoned so the dispatcher drops it instead of burning
            # device time on a request whose client already saw a timeout
            # (under overload, executing zombies turns a transient spike
            # into a sustained one)
            p.cancelled = True
            with self._lock:
                self.stats["cancelled"] = self.stats.get("cancelled", 0) + 1
            raise TimeoutError("localization request timed out")
        if p.error is not None:
            raise p.error
        return p.mask, p.heatmap

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join()

    # ------------------------------------------------------------ internal

    def _loop(self) -> None:
        stop = False
        while not stop:
            first = self._queue.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.runner.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                batch.append(nxt)
            self._run_batch(batch)

    def _run_batch(self, batch: list[_Pending]) -> None:
        batch = [p for p in batch if not p.cancelled]
        if not batch:
            return
        t0 = time.monotonic()
        try:
            masks, heatmaps = self.runner.run(
                np.stack([p.frame for p in batch]),
                np.stack([p.wave for p in batch]))
        except Exception as e:  # propagate to every waiter, keep serving
            with self._lock:
                self.stats["errors"] += len(batch)
            for p in batch:
                p.error = e
                p.event.set()
            return
        dt_ms = (time.monotonic() - t0) * 1e3
        with self._lock:
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            hist = self.stats["batch_hist"]
            hist[str(len(batch))] = hist.get(str(len(batch)), 0) + 1
            self.stats["device_ms_total"] += dt_ms
        for p, m, h in zip(batch, masks, heatmaps):
            p.mask, p.heatmap = m, h
            p.event.set()

    def snapshot(self) -> dict:
        with self._lock:
            out = dict(self.stats)
            out["batch_hist"] = dict(self.stats["batch_hist"])
        return out

"""Headline benchmark: clips/sec/chip for the AVENet localization pipeline.

Reports three numbers in ONE JSON line:

  * value (headline): steady-state ON-DEVICE pipeline clips/s — per clip, a
    10 s 22.05 kHz waveform -> log-spectrogram (DFT matmuls) -> audio encoder,
    one 224x224 frame -> image encoder -> 14x14 heatmap -> on-device
    postprocess to a 224x224 binary mask.  bf16, B=128, scan-amortized.
  * end_to_end_clips_per_sec: the same pipeline fed from DISK — JPEG+WAV
    host decode (native C++ fused decode+resize), BatchLoader threads,
    device prefetch overlapping H2D with compute.  This is the
    BASELINE.json metric ("decode + spectrogram + heatmap"); it is
    host-decode-bound, so host_cores is reported alongside.
  * train_step_ms: the recipe-batch training step (bs=20 x 16-frame clips,
    two-view 4-term objective, remat) — one fused jit program per step.

Timing methodology: the device can sit behind a tunnel with a ~30 ms
command round trip, so per-dispatch wall timing is latency-bound.  The
device pipeline runs K times inside ONE jit program (lax.scan with a
per-step input perturbation so nothing hoists) and the dispatch round trip
— MEASURED with a null program, not assumed — is subtracted.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp

from avtubes.core.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

NORTH_STAR = 2000.0  # clips/sec/chip target from BASELINE.json
BATCH = 128
SCAN_STEPS = 10

# bf16 peak matmul throughput per chip, for MFU.  v5e: 197 TFLOP/s
# (394 TFLOP/s int8); v4: 275; v5p: 459.
BF16_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
}


def device_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for k, v in sorted(BF16_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if k in kind:
            return v
    return None


def compiled_flops(jitted, *args, **kwargs) -> float:
    """FLOPs of one invocation from XLA's cost analysis of the compiled
    executable (an analytical count of the optimized HLO, not a measurement).
    The persistent compilation cache makes the extra lower+compile cheap."""
    ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def measure_rtt() -> float:
    """Synchronous round trip of a null program: dispatch + scalar readback.

    Each rep blocks on the result (async-pipelined dispatches would measure
    host overhead only, ~2 ms, not the tunnel round trip).
    """
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0.0)))  # compile
    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        float(f(jnp.float32(i)))
    return (time.perf_counter() - t0) / reps


def build_pipeline():
    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
    from avtubes.evaluation.postprocess import heatmap_to_mask_batch
    from avtubes.models import AVENet

    cfg = SpectrogramConfig()
    # s2d stems: exact transform of the 7x7/s2 stems (tests/test_s2d_stem.py
    # pins equivalence); ~10% faster now that postprocess no longer dominates
    model = AVENet(dtype=jnp.bfloat16, s2d_stem=True)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)), train=False,
    ))(jax.random.PRNGKey(0))

    def clip_pipeline(frames, waveforms):
        spec = log_spectrogram(waveforms, cfg)[..., None]  # (B, 257, 431, 1)
        out = model.apply(variables, frames, spec, train=False)
        return heatmap_to_mask_batch(out.heatmap)

    @jax.jit
    def timed(frames, waves):
        def body(acc, i):
            masks = clip_pipeline(frames + i * 1e-6, waves + i * 1e-6)
            return acc + masks[0, 0, 0], None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(SCAN_STEPS, dtype=jnp.float32))
        return acc

    @jax.jit
    def timed_spec(frames, specs):
        # the e2e run ships spec_int16 payloads whose device leg skips the
        # DFT (log_spectrogram passthrough) — the decomposition's device
        # bound must measure THAT pipeline, not the waveform one
        def body(acc, i):
            masks = clip_pipeline(frames + i * 1e-6, specs + i.astype(jnp.int16))
            return acc + masks[0, 0, 0], None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(SCAN_STEPS, dtype=jnp.float32))
        return acc

    @jax.jit
    def masks_once(frames_uint8, waves):
        from avtubes.data.transforms import normalize_imagenet

        return clip_pipeline(normalize_imagenet(frames_uint8), waves)

    rng = np.random.RandomState(0)
    frames = jax.device_put(rng.rand(BATCH, 224, 224, 3).astype(np.float32))
    waves = jax.device_put(
        np.clip(rng.randn(BATCH, cfg.num_samples) * 0.1, -1, 1).astype(np.float32))
    specs = jax.device_put(rng.randint(-2000, 100, (BATCH,) + cfg.shape)
                           .astype(np.int16))
    return timed, timed_spec, masks_once, frames, waves, specs


def build_int8_pipeline():
    """The same inference pipeline with int8 QuantConv backbones (the
    export_model --quant int8 serving mode; MXU int8 peak is 2x bf16).
    Variables come from the SAME init — the param trees are identical."""
    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
    from avtubes.evaluation.postprocess import heatmap_to_mask_batch
    from avtubes.models import AVENet

    cfg = SpectrogramConfig()
    model = AVENet(dtype=jnp.bfloat16, s2d_stem=True, quant_int8=True)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)), train=False,
    ))(jax.random.PRNGKey(0))

    @jax.jit
    def timed(frames, waves):
        def body(acc, i):
            spec = log_spectrogram(waves + i * 1e-6, cfg)[..., None]
            out = model.apply(variables, frames + i * 1e-6, spec, train=False)
            masks = heatmap_to_mask_batch(out.heatmap)
            return acc + masks[0, 0, 0], None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(SCAN_STEPS, dtype=jnp.float32))
        return acc

    return timed


def _rep_stats(run, reps: int) -> tuple[list[float], list[float]]:
    """Time `run()` reps times.  Per rep, also sample the machine-wide busy
    CPU NOT attributable to this process, per wall second (the co-tenant
    indicator, ~0 = clean) — so best-of-N legs carry the evidence needed to
    tell a regression from a noisy neighbor.  Returns (walls, cotenants)."""
    hz = float(os.sysconf("SC_CLK_TCK")) if hasattr(os, "sysconf") else 100.0
    walls, cotenants = [], []
    for _ in range(reps):
        stat0 = _proc_stat_ticks()
        cpu0 = time.process_time()
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
        walls.append(wall)
        if stat0 is not None and wall > 0:
            total1, idle1 = _proc_stat_ticks()
            busy_s = ((total1 - stat0[0]) - (idle1 - stat0[1])) / hz
            cotenants.append(
                max(0.0, busy_s - (time.process_time() - cpu0)) / wall)
        else:
            cotenants.append(float("nan"))
    return walls, cotenants


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def bench_device_pipeline(timed, frames, waves, rtt: float,
                          reps: int = 5) -> tuple[float, float, float]:
    """Returns (best clips/s, median clips/s, co-tenant fraction at best).

    Best-of-N is the capacity number (RTT jitter through the tunnel only ever
    ADDS time); the median and the co-tenant sample are the dispersion
    evidence a reader needs to adjudicate regression-vs-interference."""
    float(timed(frames, waves))  # compile
    walls, cotenants = _rep_stats(lambda: float(timed(frames, waves)), reps)
    # the measured null-program RTT already covers dispatch + scalar readback
    cps = [BATCH * SCAN_STEPS / (w - rtt) for w in walls]
    i_best = max(range(len(cps)), key=lambda i: cps[i])
    return cps[i_best], _median(cps), cotenants[i_best]


def measure_h2d_mbps() -> tuple[float, float]:
    """Host-to-device link rate for INCOMPRESSIBLE data (MB/s, best of 6
    probes in two spaced rounds) plus the transfer's host-CPU fraction
    (process-CPU seconds / wall).

    Two traps found the hard way: (a) the tunnel transport compresses, so a
    compressible test buffer (np.ones) reads ~2.5x the rate real decoded
    media achieves — random bytes measure the binding rate; (b)
    block_until_ready can return before materialization here, so completion
    is forced by a scalar readback of each fresh buffer.

    The CPU fraction is the third trap (round-3 record): the compressing
    transport burns host CPU, so on a 1-core host "transfer" is NOT free
    concurrency — decode and H2D largely serialize.  It is measured, not
    assumed, so a PCIe host (DMA, fraction ~0) gets the optimistic bound
    back automatically.
    """
    rng = np.random.RandomState(0)
    bufs = [rng.randint(0, 256, 16 * 1024 * 1024, dtype=np.uint8)
            for _ in range(4)]
    touch = jax.jit(lambda x: x.ravel()[0].astype(jnp.float32))
    float(touch(jax.device_put(bufs[0])))  # warm path + compile
    best = 0.0
    wall_total = cpu_total = busy_ticks = 0.0
    hz = float(os.sysconf("SC_CLK_TCK")) if hasattr(os, "sysconf") else 100.0
    # two spaced probe rounds: a single short window can land entirely
    # inside a co-tenant stall and report half the link's real rate (seen
    # in a round-4 run: probe 22.4 MB/s while the e2e pipeline itself
    # sustained 41.7) — `best` over spaced draws is the capacity estimate.
    # /proc/stat is sampled per-probe so the inter-round sleep doesn't
    # pollute the machine-busy window.
    for i, buf in enumerate(bufs[1:] + bufs[1:]):
        if i == 3:
            time.sleep(2.0)
        stat0 = _proc_stat_ticks()
        c0 = time.process_time()
        t0 = time.perf_counter()
        float(touch(jax.device_put(buf)))
        wall = time.perf_counter() - t0
        cpu_total += time.process_time() - c0
        wall_total += wall
        best = max(best, buf.nbytes / 1e6 / wall)
        if stat0 is not None:
            total1, idle1 = _proc_stat_ticks()
            busy_ticks += (total1 - stat0[0]) - (idle1 - stat0[1])
    cpu_fraction = min(1.0, cpu_total / wall_total) if wall_total else 1.0
    # machine-level busy fraction over the same probes: the tunnel daemon's
    # compression CPU is OUTSIDE this process, so process_time alone
    # understates the transfer's true core cost on a shared host
    machine_fraction = float("nan")
    if _proc_stat_ticks() is not None and wall_total:
        machine_fraction = min(1.0, (busy_ticks / hz) / wall_total)
    return best, cpu_fraction, machine_fraction


def _proc_stat_ticks() -> tuple[float, float] | None:
    """(total, idle+iowait) jiffies from /proc/stat, or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            vals = [float(v) for v in f.readline().split()[1:]]
        return sum(vals), vals[3] + vals[4]
    except (OSError, IndexError, ValueError):
        return None


def bench_end_to_end(masks_once, n_clips: int = 192,
                     transport: str = "spec_int16"
                     ) -> tuple[float, float, float, float]:
    """Disk -> decode -> H2D -> encode+mask, fully overlapped.

    Returns (end_to_end clips/s, host-only clips/s, MB/clip shipped,
    co-tenant busy fraction during the best run).  The host-only number
    times the identical loader pass with the device leg removed; together
    with the measured incompressible link rate and the transfer's measured
    host-CPU fraction this decomposes end-to-end into host capacity vs
    link vs device capacity.  NOTE the binding model (established by the
    round-3 record): stages only overlap to the extent they use DIFFERENT
    resources — on a 1-core host whose tunnel transport burns CPU to
    compress, decode CPU and transfer CPU serialize, so the achievable
    bound is the SERIAL one computed in main(), not min(host, link,
    device).

    Audio ships as a host-computed int16 log-spectrogram
    (audio_transport='spec_int16', ~3e-5 quantization): on a thin
    host->device link the waveform's extra 220 KB/clip costs more link time
    than the ~4 ms/clip host STFT costs CPU.  Production PCIe hosts would
    flip this to 'int16' and run the STFT on device."""
    from avtubes.core.config import DataConfig
    from avtubes.data.pipeline import device_prefetch, make_hardway_loader
    from avtubes.data.synthetic import write_synthetic_dataset

    with tempfile.TemporaryDirectory() as root:
        ids = write_synthetic_dataset(root, n_videos=n_clips, frames=1, seconds=10)
        cfg = DataConfig(audio_transport=transport)
        loader = make_hardway_loader(root, ids, cfg, batch_size=64,
                                     num_workers=max(2, (os.cpu_count() or 1)))

        def run_once():
            acc = None
            for batch in device_prefetch(loader.epoch(0), depth=2):
                acc = masks_once(batch["frame"], batch["waveform"])
            jax.block_until_ready(acc)

        # best-of-N: the host side shares cores with co-tenants, so single
        # runs swing +-50%; the max is the reproducible capacity number.
        # Each run also records a co-tenant indicator — the machine-wide
        # busy CPU time NOT attributable to this process, per wall second
        # (0 = we had the core to ourselves) — so a future reader can tell
        # a regression from a noisy neighbor.
        run_once()  # warm: page cache + compile
        hz = float(os.sysconf("SC_CLK_TCK")) if hasattr(os, "sysconf") else 100.0
        e2e, cotenant = 0.0, float("nan")
        for _ in range(3):
            stat0 = _proc_stat_ticks()
            cpu0 = time.process_time()
            t0 = time.perf_counter()
            run_once()
            wall = time.perf_counter() - t0
            cps = n_clips / wall
            if stat0 is not None:
                total1, idle1 = _proc_stat_ticks()
                busy_s = ((total1 - stat0[0]) - (idle1 - stat0[1])) / hz
                other = max(0.0, busy_s - (time.process_time() - cpu0)) / wall
            else:
                other = float("nan")
            if cps > e2e:
                e2e, cotenant = cps, other

        def host_only():
            n, nbytes = 0, 0
            for batch in loader.epoch(0):
                n += batch["frame"].shape[0]
                nbytes += sum(v.nbytes for v in batch.values()
                              if isinstance(v, np.ndarray))
            return n, nbytes

        _, total_bytes = host_only()
        mb_per_clip = total_bytes / 1e6 / n_clips
        host = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            host_only()
            host = max(host, n_clips / (time.perf_counter() - t0))
    return e2e, host, mb_per_clip, cotenant


def bench_train_step(rtt: float) -> tuple[float, float, float, float, dict]:
    """Recipe-batch training step (train_hardway.py recipe: bs=20, T=16,
    two views, 4-term objective, fwd+bwd+Adam), measured the way the trainer
    runs it: G steps scan-grouped into ONE program (`hardway_multi_step`),
    so per-dispatch host overhead amortizes.  Default model config (no
    remat — remat is the opt-in memory/time tradeoff)."""
    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_multi_step

    spec_cfg = SpectrogramConfig()
    model = AVENet(dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 224, 224, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        OptimConfig(), 1)
    rng = np.random.RandomState(0)
    g = 5
    # host-cropped clip shape, as ClipTrainSource emits (T, 224, 224, 3) u8
    clips = jax.device_put(
        rng.randint(0, 256, (g, 20, 16, 224, 224, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(g, 20, spec_cfg.num_samples) * 0.1, -1, 1).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), g)

    # analytical FLOPs of ONE fused step (same math the scan body runs),
    # before any donating call invalidates `state`
    from avtubes.train.steps import hardway_fused_train_step

    step_flops = compiled_flops(hardway_fused_train_step, state, clips[0],
                                waves[0], keys[0], spec_cfg=spec_cfg)

    state, m = hardway_multi_step(state, clips, waves, keys, spec_cfg)  # compile
    float(m["loss"])
    state, m = hardway_multi_step(state, clips, waves, keys, spec_cfg)  # warm
    float(m["loss"])
    # best-of-N: a single grouped dispatch is one wall sample through the
    # tunnel, so its RTT jitter (several ms) lands unsmoothed on step_ms —
    # the same reason every other leg of this bench is best-of-N.  The
    # median + per-rep co-tenant sample are the dispersion record.
    holder = {"st": state}

    def run():
        holder["st"], mm = hardway_multi_step(holder["st"], clips, waves,
                                              keys, spec_cfg)
        float(mm["loss"])

    walls, cotenants = _rep_stats(run, 5)
    i_best = min(range(len(walls)), key=lambda i: walls[i])
    step_ms = (walls[i_best] - rtt) / g * 1000.0
    step_ms_median = (_median(walls) - rtt) / g * 1000.0
    # HBM audit: device bytes with the recipe-batch training state resident
    # (params/opt-state donated per step — double-buffering regressions show
    # up here as a jump).  The axon backend doesn't implement memory_stats,
    # so fall back to summing the host-tracked live device arrays.
    stats = jax.local_devices()[0].memory_stats() or {}
    live = stats.get("bytes_in_use", 0)
    peak = stats.get("peak_bytes_in_use", 0)
    if not live:
        live = sum(a.nbytes for a in jax.live_arrays())
    hbm = {"hbm_live_gb": round(live / 2**30, 3)}
    if peak:
        hbm["hbm_peak_gb"] = round(peak / 2**30, 3)
    # companion number: the same step with `--jitter_order fixed` (static
    # color-jitter op order — drops torchvision's random per-sample order
    # parity; measured attribution in DESIGN.md / bench_train_attrib.py).
    # Recorded so the driver-captured file carries BOTH programs: parity
    # (the headline) and the production opt-out.
    try:
        def run_fixed():
            holder["st"], mm = hardway_multi_step(
                holder["st"], clips, waves, keys, spec_cfg,
                jitter_order="fixed")
            float(mm["loss"])

        run_fixed()  # compile
        run_fixed()  # warm
        walls_f, _ = _rep_stats(run_fixed, 3)
        hbm["train_step_ms_fixed_jitter"] = round(
            (min(walls_f) - rtt) / g * 1000.0, 1)
    except Exception as e:
        print(f"bench: fixed-jitter train variant skipped: {e!r}",
              file=__import__("sys").stderr)
    return step_ms, step_ms_median, cotenants[i_best], step_flops, hbm


def bench_train3d(rtt: float) -> dict:
    """3D tube recipe step (`/root/reference/train_3D.py:52-68` recipe:
    bs=20 x 16-frame 224x224 clips, hard-way CE over (b·t), fwd+bwd+Adam) as
    ONE fused program (`train3d_fused_step`), plus the per-frame eval
    forward (`eval3d_heatmap_step`) at the same shape.

    The T-preserving ResNet3D is the heaviest model in the capability set;
    its activation footprint at the recipe batch can exceed HBM without
    remat, so the leg first tries the default (no remat) and falls back to
    the remat model on an OOM, recording which one ran."""
    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import FullModel
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import eval3d_heatmap_step, train3d_fused_step

    spec_cfg = SpectrogramConfig()
    b, t = 20, 16
    rng = np.random.RandomState(0)
    clips = jax.device_put(
        rng.randint(0, 256, (b, t, 224, 224, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(b, spec_cfg.num_samples) * 0.1, -1, 1)
        .astype(np.float32))
    key = jax.random.PRNGKey(1)

    def build(remat: bool):
        model = FullModel(dtype=jnp.bfloat16, remat=remat)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, *spec_cfg.shape, 1)),
             jnp.zeros((1, 2, 64, 64, 3))),
            OptimConfig(), 1)
        flops = compiled_flops(train3d_fused_step, state, clips, waves, key,
                               spec_cfg=spec_cfg)
        st, m = train3d_fused_step(state, clips, waves, key, spec_cfg)
        float(m["loss"])  # compile + run once (OOM surfaces here)
        return st, flops

    remat = False
    try:
        state, step_flops = build(False)
    except Exception as e:
        print(f"bench: train3d no-remat failed ({type(e).__name__}); "
              f"retrying with remat", file=__import__("sys").stderr)
        remat = True
        state, step_flops = build(True)

    holder = {"st": state}

    def run():
        holder["st"], m = train3d_fused_step(holder["st"], clips, waves, key,
                                             spec_cfg)
        float(m["loss"])

    run()  # warm
    walls, cotenants = _rep_stats(run, 5)
    i_best = min(range(len(walls)), key=lambda i: walls[i])
    step_ms = (walls[i_best] - rtt) * 1000.0
    out = {
        "train3d_step_ms": round(step_ms, 1),
        "train3d_step_ms_median": round((_median(walls) - rtt) * 1000.0, 1),
        "train3d_cotenant_busy_fraction": round(cotenants[i_best], 3),
        "train3d_tflops_per_step": round(step_flops / 1e12, 2),
        "train3d_remat": remat,
        "train3d_clips_per_sec": round(b / (step_ms / 1e3), 1),
    }
    peak = device_peak_flops()
    if peak:
        out["mfu_train3d"] = round(step_flops / (step_ms / 1e3) / peak, 3)

    # per-frame eval forward at the same clip shape (the reference's
    # whole-video batched-clip eval, train_3D.py:152-154), scan-amortized
    state3 = holder["st"]
    spec = jnp.zeros((b, *spec_cfg.shape, 1), jnp.float32)
    video = jax.device_put(
        (rng.rand(b, t, 224, 224, 3) * 2 - 1).astype(np.float32))

    @jax.jit
    def timed_eval(video, spec):
        def body(acc, i):
            h = eval3d_heatmap_step(state3, video + i * 1e-6, spec)
            return acc + h[0, 0, 0, 0], None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(3, dtype=jnp.float32))
        return acc

    float(timed_eval(video, spec))  # compile
    walls, _ = _rep_stats(lambda: float(timed_eval(video, spec)), 3)
    eval_s = (min(walls) - rtt) / 3
    out["eval3d_clips_per_sec"] = round(b / eval_s, 1)
    return out


def bench_train_1frame(rtt: float) -> dict:
    """1-frame trainer step at the reference recipe
    (`/root/reference/train_hardway_1frame.py:54`: bs=3, middle frame,
    plain hard-way CE).  bs=3 device time is tiny vs the tunnel RTT, so G
    steps scan into one program and the dispatch cost amortizes — the same
    methodology as the flagship leg."""
    import functools

    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_1frame_fused_step

    spec_cfg = SpectrogramConfig()
    bs, g = 3, 20
    model = AVENet(dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 224, 224, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        OptimConfig(), 1)
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, (g, bs, 224, 224, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(g, bs, spec_cfg.num_samples) * 0.1, -1, 1)
        .astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), g)

    step_flops = compiled_flops(hardway_1frame_fused_step, state, frames[0],
                                waves[0], keys[0], spec_cfg=spec_cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, frames, waves, keys):
        def body(st, inp):
            f, w, k = inp
            st, m = hardway_1frame_fused_step(st, f, w, k, spec_cfg)
            return st, m["loss"]
        return jax.lax.scan(body, state, (frames, waves, keys))

    state, losses = multi(state, frames, waves, keys)  # compile
    float(losses[-1])
    holder = {"st": state}

    def run():
        holder["st"], ls = multi(holder["st"], frames, waves, keys)
        float(ls[-1])

    run()  # warm
    walls, cotenants = _rep_stats(run, 5)
    i_best = min(range(len(walls)), key=lambda i: walls[i])
    step_ms = (walls[i_best] - rtt) / g * 1000.0
    out = {
        "train1f_step_ms": round(step_ms, 2),
        "train1f_step_ms_median": round((_median(walls) - rtt) / g * 1000.0, 2),
        "train1f_cotenant_busy_fraction": round(cotenants[i_best], 3),
        "train1f_gflops_per_step": round(step_flops / 1e9, 1),
    }
    peak = device_peak_flops()
    if peak:
        out["mfu_train1f"] = round(step_flops / (step_ms / 1e3) / peak, 3)
    return out


def bench_flowstep(rtt: float) -> dict:
    """Flow-consistency trainer step at the reference recipe shape
    (`/root/reference/flow.py:127-161`: bs=20, 16 frames, 256px) with the
    correlation cost volume + bilinear warp LIVE in the objective
    (weight 0.1), plus the `compute_flow=False` companion (the TPU-native
    skip of the flow net at weight 0 — the reference's effective objective
    without its always-on FlowNet probe).  Deeper sweep (probe_only
    variant, overhead decomposition): scripts/bench_flow_step.py."""
    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.models.flownet import FlowNetLite
    from avtubes.train.flow import flow_fused_train_step
    from avtubes.train.state import create_train_state

    spec_cfg = SpectrogramConfig()
    b, t, s = 20, 16, 256
    rng = np.random.RandomState(0)
    clips = jax.device_put(
        rng.randint(0, 256, (b, t, s, s, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(b, spec_cfg.num_samples) * 0.1, -1, 1)
        .astype(np.float32))
    key = jax.random.PRNGKey(1)
    flow_vars = jax.jit(FlowNetLite().init)(
        jax.random.PRNGKey(7), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, s, s, 3)))

    def build_state():
        model = AVENet(dtype=jnp.bfloat16)
        return create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, s, s, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
            OptimConfig(), 1)

    out = {}
    peak = device_peak_flops()
    for weight, cf, tag, reps in ((0.1, True, "flowstep", 5),
                                  (0.0, False, "flowstep_noflow", 3)):
        state = build_state()
        flops = compiled_flops(
            flow_fused_train_step, state, flow_vars, clips, waves, key,
            spec_cfg=spec_cfg, flow_loss_weight=weight, image_size=s,
            compute_flow=cf)
        state, m = flow_fused_train_step(state, flow_vars, clips, waves, key,
                                         spec_cfg, weight, s, compute_flow=cf)
        float(m["loss"])  # compile + run once
        holder = {"st": state}

        def run():
            holder["st"], mm = flow_fused_train_step(
                holder["st"], flow_vars, clips, waves, key, spec_cfg,
                weight, s, compute_flow=cf)
            float(mm["loss"])

        run()  # warm
        walls, cotenants = _rep_stats(run, reps)
        i_best = min(range(len(walls)), key=lambda i: walls[i])
        step_ms = (walls[i_best] - rtt) * 1000.0
        out[f"{tag}_ms"] = round(step_ms, 1)
        if tag == "flowstep":
            out["flowstep_ms_median"] = round(
                (_median(walls) - rtt) * 1000.0, 1)
            out["flowstep_cotenant_busy_fraction"] = round(
                cotenants[i_best], 3)
            out["flowstep_tflops_per_step"] = round(flops / 1e12, 2)
            if peak:
                out["mfu_flowstep"] = round(
                    flops / (step_ms / 1e3) / peak, 3)
    return out


def wait_for_backend(budget_s: float = 900.0, probe_timeout_s: float = 90.0):
    """Bounded wait for a reachable accelerator backend.

    In this environment the device sits behind a tunnel that occasionally
    wedges; when it does, ANY in-process jax backend init blocks forever
    (sleeping at 0% CPU), which would turn the whole bench into a silent
    hang.  Probe from a subprocess (so the parent never wedges) and retry
    until the tunnel recovers or the budget runs out — then fail loudly.
    """
    import subprocess
    import sys

    deadline = time.monotonic() + float(
        os.environ.get("AVTUBES_BENCH_BACKEND_WAIT_S", budget_s))
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                print(f"bench: device backend unreachable after {attempt} "
                      f"probes (tunnel wedged?): {e!r}", file=sys.stderr)
                sys.exit(1)
            print(f"bench: backend probe {attempt} failed, retrying "
                  f"({remaining:.0f}s budget left)", file=sys.stderr)
            time.sleep(min(30.0, max(1.0, remaining)))


def main():
    # compilation cache already enabled at module import (driver reruns
    # start warm, per-CPU-scoped dir)
    wait_for_backend()
    rtt = measure_rtt()
    h2d, h2d_cpu_fraction, h2d_machine_fraction = measure_h2d_mbps()
    timed, timed_spec, masks_once, frames, waves, specs = build_pipeline()
    device_cps, device_cps_median, device_cotenant = bench_device_pipeline(
        timed, frames, waves, rtt)
    device_spec_cps, _, _ = bench_device_pipeline(timed_spec, frames, specs, rtt)
    int8_cps = None
    try:
        int8_cps, _, _ = bench_device_pipeline(
            build_int8_pipeline(), frames, waves, rtt)
    except Exception as e:  # int8 conv lowering is backend-dependent
        print(f"bench: int8 pipeline skipped: {e!r}", file=__import__("sys").stderr)
    # MFU: analytical FLOPs (XLA cost analysis of the compiled inference
    # program) x measured throughput / chip bf16 peak
    rng = np.random.RandomState(0)
    frames_u8 = jax.device_put(
        rng.randint(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8))
    inf_flops = compiled_flops(masks_once, frames_u8, waves)
    peak = device_peak_flops()
    e2e_cps, host_cps, mb_per_clip, cotenant = bench_end_to_end(masks_once)
    # the e2e run is itself a link measurement: it shipped mb_per_clip x
    # e2e_cps MB/s of incompressible data through the same link (while ALSO
    # decoding), so that rate is a demonstrated lower bound on link
    # capacity.  Flooring the probe with it keeps the bound self-consistent
    # when the probe's window caught a co-tenant stall (a round-4 run
    # probed 22.4 MB/s while its own e2e leg sustained 41.7 — which would
    # report a nonsensical fraction-of-bound of 1.86).
    h2d_probe = h2d
    h2d = max(h2d, e2e_cps * mb_per_clip)
    link_bound_cps = h2d / mb_per_clip
    # achievable bound: host decode is pure CPU; the transfer consumes
    # h2d_cpu_fraction of its wall in host CPU (a compressing tunnel ~1, a
    # DMA PCIe host ~0).  CPU legs serialize on a shared core; the
    # transfer's non-CPU remainder and the device leg overlap.  Hence
    #   per-clip wall >= max(cpu_decode + cpu_transfer, wall_transfer,
    #                        wall_device)
    transfer_wall_per_clip = mb_per_clip / h2d
    serial_cpu_per_clip = (1.0 / host_cps
                           + h2d_cpu_fraction * transfer_wall_per_clip)
    serial_bound_cps = 1.0 / serial_cpu_per_clip
    train_ms, train_ms_median, train_cotenant, train_flops, hbm = \
        bench_train_step(rtt)
    out = {
        "metric": "clips/sec/chip (spectrogram+encode+heatmap, bf16, B=128)",
        "value": round(device_cps, 1),
        "unit": "clips/s",
        "vs_baseline": round(device_cps / NORTH_STAR, 3),
        # dispersion + co-tenant evidence for the best-of-N legs (the e2e
        # leg carries its own): median-of-reps and the machine-busy CPU not
        # from this process during the best rep
        "value_median": round(device_cps_median, 1),
        "device_cotenant_busy_fraction": round(device_cotenant, 3),
        "end_to_end_clips_per_sec": round(e2e_cps, 1),
        "end_to_end_vs_baseline": round(e2e_cps / NORTH_STAR, 3),
        "host_decode_clips_per_sec": round(host_cps, 1),
        # stage decomposition.  min(host, link, device) is the OPTIMISTIC
        # bound (valid only when stages overlap on independent resources);
        # serial_bound accounts for decode CPU + transfer CPU serializing
        # on a shared core (h2d_cpu_fraction measured, not assumed) and is
        # the achievable bound on this host.
        "mb_per_clip_shipped": round(mb_per_clip, 3),
        "link_bound_clips_per_sec": round(link_bound_cps, 1),
        # device bound measured with the SAME spec_int16 transport the e2e
        # run ships (its device leg skips the DFT via the passthrough)
        "device_spec_transport_clips_per_sec": round(device_spec_cps, 1),
        "h2d_cpu_fraction": round(h2d_cpu_fraction, 3),
        # machine-wide busy fraction during the H2D probe: captures the
        # tunnel daemon's out-of-process compression CPU (plus co-tenants)
        "h2d_machine_busy_fraction": round(h2d_machine_fraction, 3),
        "serial_bound_clips_per_sec": round(serial_bound_cps, 1),
        "optimistic_bound_clips_per_sec": round(
            min(host_cps, link_bound_cps, device_spec_cps), 1),
        "e2e_fraction_of_achievable_bound": round(
            e2e_cps / min(serial_bound_cps, link_bound_cps, device_spec_cps),
            3),
        # machine-wide busy CPU not from this process during the best e2e
        # run, per wall second (~0 = clean run; >>0 = noisy neighbor)
        "cotenant_busy_fraction": round(cotenant, 3),
        "train_step_ms_recipe_batch": round(train_ms, 1),
        "train_step_ms_median": round(train_ms_median, 1),
        "train_cotenant_busy_fraction": round(train_cotenant, 3),
        "gflops_per_clip_inference": round(inf_flops / BATCH / 1e9, 2),
        "tflops_per_train_step": round(train_flops / 1e12, 2),
        "rtt_ms_measured": round(rtt * 1000.0, 2),
        # effective = max(probe, rate the e2e run itself demonstrably
        # sustained); probe kept so a stalled-probe run is identifiable
        "h2d_mbps_measured": round(h2d, 1),
        "h2d_mbps_probe": round(h2d_probe, 1),
        "host_cores": os.cpu_count(),
        **hbm,
    }
    if int8_cps:
        out["int8_clips_per_sec"] = round(int8_cps, 1)
        out["int8_speedup_vs_bf16"] = round(int8_cps / device_cps, 3)
    # opt-in spec_int8 transport (halves the shipped spectrogram bytes;
    # ~8e-3 quantization — metric deltas measured in DESIGN.md): its e2e
    # rate shows what the thin-link mode buys when the link binds
    try:
        e2e8, _, mb8, _ = bench_end_to_end(masks_once, transport="spec_int8")
        out["e2e_spec_int8_clips_per_sec"] = round(e2e8, 1)
        out["spec_int8_mb_per_clip"] = round(mb8, 3)
    except Exception as e:
        print(f"bench: spec_int8 e2e skipped: {e!r}", file=__import__("sys").stderr)
    if peak:
        out["mfu_inference"] = round(inf_flops / BATCH * device_cps / peak, 3)
        out["mfu_train"] = round(train_flops / (train_ms / 1e3) / peak, 3)
    # the other two reference trainers, at their reference recipe shapes
    # (capability drivers must carry perf evidence, not just tests)
    try:
        out.update(bench_train3d(rtt))
    except Exception as e:
        print(f"bench: train3d leg skipped: {e!r}", file=__import__("sys").stderr)
    try:
        out.update(bench_train_1frame(rtt))
    except Exception as e:
        print(f"bench: train1f leg skipped: {e!r}", file=__import__("sys").stderr)
    try:
        out.update(bench_flowstep(rtt))
    except Exception as e:
        print(f"bench: flow leg skipped: {e!r}", file=__import__("sys").stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

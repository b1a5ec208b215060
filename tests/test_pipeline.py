"""Input pipeline tests: index, sampler, transforms, loaders on a synthetic dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avtubes.core.config import DataConfig
from avtubes.data.index import load_split
from avtubes.data.pipeline import (
    BatchLoader,
    ClipTrainSource,
    HardwayTestSource,
    SyntheticSource,
    device_prefetch,
)
from avtubes.data.sampler import sample_frame_indices
from avtubes.data.synthetic import write_synthetic_dataset
from avtubes.data.transforms import augment_train_batch, normalize_imagenet


def test_sampler_matches_reference_semantics():
    # long clip: centered, stride 16, no wrap needed
    idx = sample_frame_indices(300, 16, 16)
    assert len(idx) == 16
    assert idx[7] == 134 and idx[8] == 150  # middle pair around length//2
    assert idx == sorted(idx)
    # short clip: virtual doubling + wrap
    idx2 = sample_frame_indices(20, 16, 16)
    assert len(idx2) == 16
    assert all(0 <= i < 20 for i in idx2)


def test_sampler_single_frame():
    idx = sample_frame_indices(100, 2, 2)
    assert len(idx) == 2


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    ids = write_synthetic_dataset(root, n_videos=4, frames=4)
    return root, ids


def test_index_reads_synthetic_metadata(dataset):
    root, ids = dataset
    assert load_split(root / "metadata", "flickr", "train", subset=5) == ids
    assert load_split(root / "metadata", "flickr", "test_hardway") == ids


def test_clip_train_source_shapes(dataset):
    root, ids = dataset
    cfg = DataConfig(frame_density=4, samplerate=22050)
    src = ClipTrainSource(root, ids, cfg)
    rng = np.random.RandomState(0)
    s = src.load(0, rng)
    assert s["clip"].shape == (4, 224, 224, 3)
    assert s["clip"].dtype == np.uint8
    assert s["waveform"].shape == (22050 * 10,)
    assert s["waveform"].dtype == np.int16  # int16 PCM transport (default)
    cfg_f = DataConfig(frame_density=4, samplerate=22050,
                       audio_transport="float32")
    sf = ClipTrainSource(root, ids, cfg_f).load(0, np.random.RandomState(0))
    assert sf["waveform"].dtype == np.float32
    assert np.abs(sf["waveform"]).max() <= 1.0
    # int16 transport is the exact quantization of the float path
    np.testing.assert_array_equal(
        s["waveform"],
        np.clip(np.rint(sf["waveform"] * 32768.0), -32768, 32767).astype(np.int16))


def test_hardway_test_source(dataset):
    root, ids = dataset
    cfg = DataConfig()
    src = HardwayTestSource(root, ids, cfg)
    s = src.load(1)
    assert s["frame"].shape == (224, 224, 3)


def test_batch_loader_deterministic_and_complete(dataset):
    root, ids = dataset
    cfg = DataConfig(frame_density=4)
    src = ClipTrainSource(root, ids, cfg)
    loader = BatchLoader(src, batch_size=2, num_workers=3, shuffle=True, seed=7)
    batches1 = list(loader.epoch(0))
    batches2 = list(BatchLoader(src, batch_size=2, num_workers=1, shuffle=True, seed=7).epoch(0))
    assert len(batches1) == 2
    seen = [i for b in batches1 for i in b["id"]]
    assert sorted(seen) == sorted(ids)
    # worker count must not change the stream (order preserved by position)
    for b1, b2 in zip(batches1, batches2):
        assert b1["id"] == b2["id"]
        np.testing.assert_array_equal(b1["clip"], b2["clip"])


def test_batch_loader_skips_bad_samples(dataset):
    root, ids = dataset
    cfg = DataConfig(frame_density=4)
    src = ClipTrainSource(root, ids + ["missing_id"], cfg)
    loader = BatchLoader(src, batch_size=2, num_workers=2, shuffle=False, drop_last=False)
    batches = list(loader.epoch(0))
    assert loader.skipped == 1
    assert loader.epoch_skipped == 1
    assert sum(len(b["id"]) for b in batches) == len(ids)
    # epoch_skipped resets per epoch; total keeps accumulating
    list(loader.epoch(1))
    assert loader.epoch_skipped == 1
    assert loader.skipped == 2


def test_flag_round_trip():
    from avtubes.core.config import ExperimentConfig

    cfg = ExperimentConfig.from_args([
        "--use_pretrained", "--pretrained_path", "/tmp/ck.pth.tar",
        "--batch_size", "7", "--learning_rate", "1e-5", "--testset", "vggss",
    ])
    assert cfg.train.use_pretrained is True
    assert cfg.train.pretrained_path == "/tmp/ck.pth.tar"
    assert cfg.optim.batch_size == 7
    assert cfg.data.testset == "vggss"
    # the argparse trap: omitting the flag must mean False
    cfg2 = ExperimentConfig.from_args([])
    assert cfg2.train.use_pretrained is False


def test_device_prefetch_passthrough():
    cfg = DataConfig(image_size=32, frame_density=2)
    src = SyntheticSource(cfg, n=6)
    loader = BatchLoader(src, batch_size=2, num_workers=2, shuffle=False)
    out = list(device_prefetch(loader.epoch(0), depth=2))
    assert len(out) == 3
    assert isinstance(out[0]["clip"], jax.Array)


def test_device_prefetch_preserves_order_and_propagates_errors():
    # order: the staging thread must yield batches in iterator order
    def numbered(n):
        for i in range(n):
            yield {"x": np.full((2, 2), i, np.float32)}

    out = list(device_prefetch(numbered(7), depth=3))
    assert [int(b["x"][0, 0]) for b in out] == list(range(7))

    # errors raised inside the source iterator surface on the consumer side
    def exploding():
        yield {"x": np.zeros((1,), np.float32)}
        raise RuntimeError("decode failed mid-epoch")

    it = device_prefetch(exploding(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed mid-epoch"):
        list(it)


def test_device_prefetch_abandoned_consumer_stops_stager():
    import threading as _threading

    started = _threading.active_count()

    def endless():
        i = 0
        while True:
            yield {"x": np.full((1,), i, np.float32)}
            i += 1

    it = device_prefetch(endless(), depth=2)
    next(it)
    it.close()  # consumer breaks mid-epoch; the staging thread must retire
    deadline = 50
    while _threading.active_count() > started and deadline:
        import time

        time.sleep(0.1)
        deadline -= 1
    assert _threading.active_count() <= started


def test_augment_train_batch_shapes_and_range():
    rng = np.random.RandomState(0)
    clips = rng.randint(0, 256, (2, 4, 224, 224, 3), dtype=np.uint8)
    v1, v2 = augment_train_batch(jax.random.PRNGKey(0), jnp.asarray(clips))
    assert v1.shape == (2, 4, 224, 224, 3)
    assert v2.shape == (2, 4, 224, 224, 3)
    # ImageNet-normalized range
    for v in (v1, v2):
        v = np.asarray(v)
        assert v.min() > -3.0 and v.max() < 3.5
    # different keys give different augmentation
    v1b, _ = augment_train_batch(jax.random.PRNGKey(1), jnp.asarray(clips))
    assert not np.allclose(np.asarray(v1), np.asarray(v1b))


def test_color_jitter_random_order_matches_forced_composition():
    """The traced random-order path (scan over a drawn permutation of
    lax.switch branches) must produce exactly the composition the same
    permutation produces when forced statically — and the permutation must
    actually vary across keys (torchvision ColorJitter's randperm(4)
    semantics, `datasets/dataloader.py:167`)."""
    from avtubes.data.transforms import color_jitter

    rng = np.random.RandomState(3)
    clip = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))

    perms_seen = set()
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        traced = np.asarray(color_jitter(key, clip))
        # reproduce the internal permutation draw (key split 5: b,c,s,h,perm)
        kp = jax.random.split(key, 5)[4]
        perm = tuple(int(i) for i in jax.random.permutation(kp, 4))
        perms_seen.add(perm)
        forced = np.asarray(color_jitter(key, clip, order=perm))
        # scan/switch vs unrolled composition fuse differently -> f32 ulp
        np.testing.assert_allclose(traced, forced, atol=1e-5)
    assert len(perms_seen) >= 3, f"permutation not varying: {perms_seen}"

    # a different op order must change the output (the whole point)
    key = jax.random.PRNGKey(0)
    a = np.asarray(color_jitter(key, clip, order=(0, 1, 2, 3)))
    b = np.asarray(color_jitter(key, clip, order=(3, 2, 1, 0)))
    assert not np.allclose(a, b)

    # output stays a valid [0,1] image batch of the same shape
    out = np.asarray(color_jitter(jax.random.PRNGKey(9), clip))
    assert out.shape == clip.shape
    assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5


def test_color_jitter_marginals_match_torchvision():
    """Each single op (others disabled) must match torchvision's functional
    float-tensor math: brightness/contrast/saturation blends and the HSV hue
    shift.  (Skipped where torchvision is absent; tolerances allow
    torchvision's 0.2989 grayscale red weight vs our PIL-parity 0.299.)"""
    tv = pytest.importorskip("torchvision.transforms.functional")
    import torch

    from avtubes.data.transforms import color_jitter

    rng = np.random.RandomState(5)
    img = rng.rand(1, 12, 12, 3).astype(np.float32)
    img_t = torch.tensor(img[0].transpose(2, 0, 1))
    key = jax.random.PRNGKey(2)
    kb, kc, ks, kh, _ = jax.random.split(key, 5)

    fb = float(jax.random.uniform(kb, (), minval=0.5, maxval=1.5))
    ours = np.asarray(color_jitter(key, jnp.asarray(img), brightness=0.5,
                                   contrast=0, saturation=0, hue=0))
    ref = tv.adjust_brightness(img_t, fb).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours[0], ref, atol=1e-6)

    fc = float(jax.random.uniform(kc, (), minval=0.5, maxval=1.5))
    ours = np.asarray(color_jitter(key, jnp.asarray(img), brightness=0,
                                   contrast=0.5, saturation=0, hue=0))
    ref = tv.adjust_contrast(img_t, fc).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours[0], ref, atol=1e-3)

    fs = float(jax.random.uniform(ks, (), minval=0.5, maxval=1.5))
    ours = np.asarray(color_jitter(key, jnp.asarray(img), brightness=0,
                                   contrast=0, saturation=0.5, hue=0))
    ref = tv.adjust_saturation(img_t, fs).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours[0], ref, atol=1e-3)

    sh = float(jax.random.uniform(kh, (), minval=-0.5, maxval=0.5))
    ours = np.asarray(color_jitter(key, jnp.asarray(img), brightness=0,
                                   contrast=0, saturation=0, hue=0.5))
    ref = tv.adjust_hue(img_t, sh).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours[0], ref, atol=1e-4)


def test_normalize_imagenet_values():
    x = jnp.full((1, 2, 2, 3), 255.0)
    out = np.asarray(normalize_imagenet(x))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_hue_shift_pick_matches_choose():
    """The where-chain HSV sector pick must equal the jnp.choose oracle
    (replaced for speed: choose lowers to general gathers on TPU)."""
    import jax.numpy as jnp

    from avtubes.data.transforms import _hue_shift

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((3, 17, 17, 3), dtype=np.float32))
    for shift in (-0.37, 0.0, 0.11, 0.5):
        got = np.asarray(_hue_shift(x, jnp.float32(shift)))
        want = np.asarray(_hue_shift_choose(x, jnp.float32(shift)))
        np.testing.assert_allclose(got, want, atol=0, rtol=0)
    # shift=0 is identity up to float round-trip error
    np.testing.assert_allclose(np.asarray(_hue_shift(x, jnp.float32(0.0))),
                               np.asarray(x), atol=1e-5)


def _hue_shift_choose(x, shift):
    """Oracle transcription of _hue_shift using jnp.choose (original impl)."""
    import jax.numpy as jnp

    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rng_ = maxc - minc
    s = jnp.where(maxc > 0, rng_ / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng_, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rng_ == 0, 0.0, h)
    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g2 = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b2 = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r2, g2, b2], axis=-1)


def test_batched_hardway_loader_matches_per_sample(dataset):
    from avtubes import native
    from avtubes.data.pipeline import BatchedHardwayLoader

    if not native.available():
        pytest.skip("native library unavailable")
    root, ids = dataset
    cfg = DataConfig()
    per_sample = BatchLoader(HardwayTestSource(root, ids, cfg), batch_size=2,
                             num_workers=2, shuffle=False, drop_last=False)
    batched = BatchedHardwayLoader(root, ids, cfg, batch_size=2)
    a = list(per_sample.epoch(0))
    b = list(batched.epoch(0))
    assert len(a) == len(b) == len(batched)
    for ba, bb in zip(a, b):
        assert ba["id"] == bb["id"]
        np.testing.assert_array_equal(ba["frame"], bb["frame"])
        assert bb["waveform"].dtype == ba["waveform"].dtype
        np.testing.assert_array_equal(ba["waveform"], bb["waveform"])


def test_batched_hardway_loader_spec_int8(dataset):
    """Under the opt-in spec_int8 transport the fused native batch path
    (int16 STFT requantized to int8) and the per-sample path must emit the
    same int8 payload."""
    from avtubes import native
    from avtubes.data.pipeline import BatchedHardwayLoader

    if not native.available():
        pytest.skip("native library unavailable")
    root, ids = dataset
    cfg = DataConfig(audio_transport="spec_int8")
    per_sample = BatchLoader(HardwayTestSource(root, ids, cfg), batch_size=2,
                             num_workers=2, shuffle=False, drop_last=False)
    batched = BatchedHardwayLoader(root, ids, cfg, batch_size=2)
    for ba, bb in zip(per_sample.epoch(0), batched.epoch(0)):
        assert ba["id"] == bb["id"]
        assert ba["waveform"].dtype == bb["waveform"].dtype == np.int8
        np.testing.assert_array_equal(ba["waveform"], bb["waveform"])


def test_batched_hardway_loader_skips_bad(dataset, tmp_path):
    import shutil

    from avtubes import native
    from avtubes.data.pipeline import BatchedHardwayLoader

    if not native.available():
        pytest.skip("native library unavailable")
    root, ids = dataset
    # copy the fixture and corrupt one frame
    broken = tmp_path / "broken"
    shutil.copytree(root, broken)
    (broken / "frames" / f"{ids[1]}.jpg").write_bytes(b"not a jpeg")
    cfg = DataConfig()
    loader = BatchedHardwayLoader(broken, ids, cfg, batch_size=2)
    got = [vid for batch in loader.epoch(0) for vid in batch["id"]]
    assert got == [v for i, v in enumerate(ids) if i != 1]
    assert loader.skipped == 1 and loader.epoch_skipped == 1


def test_batched_hardway_loader_pil_fallback_for_cmyk(dataset, tmp_path):
    """Files libjpeg declines (CMYK output) must still be scored via the PIL
    fallback, keeping batched and per-sample modes on the same sample set."""
    import shutil

    from PIL import Image

    from avtubes import native
    from avtubes.data.pipeline import BatchedHardwayLoader

    if not native.available():
        pytest.skip("native library unavailable")
    root, ids = dataset
    mixed = tmp_path / "mixed"
    shutil.copytree(root, mixed)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 256, (300, 400, 3), np.uint8)).convert(
        "CMYK").save(mixed / "frames" / f"{ids[0]}.jpg")
    cfg = DataConfig()
    loader = BatchedHardwayLoader(mixed, ids, cfg, batch_size=2)
    got = [vid for batch in loader.epoch(0) for vid in batch["id"]]
    assert got == ids  # nothing skipped
    assert loader.skipped == 0


def test_loader_worker_bug_raises_instead_of_deadlocking():
    """A non-SkippedSampleError escaping source.load used to kill the worker
    thread without its stop sentinel, leaving the epoch loop blocked in
    done.get() forever.  It must RAISE in the main loop instead."""
    from avtubes.data.pipeline import BatchLoader

    class BuggySource:
        def __len__(self):
            return 4

        def load(self, idx, rng):
            if idx == 2:
                raise ZeroDivisionError("bug in sample 2")
            return {"x": np.zeros(3, np.float32), "id": str(idx)}

    loader = BatchLoader(BuggySource(), batch_size=2, num_workers=2,
                         shuffle=False)
    with pytest.raises(ZeroDivisionError):
        list(loader.epoch(0))


def test_empty_wav_data_chunk_is_skippable(tmp_path):
    """An empty data chunk is a decode failure (ValueError -> skip-and-count
    via SkippedSampleError), not a ZeroDivisionError crash."""
    from avtubes.data.audio import prepare_waveform

    with pytest.raises(ValueError, match="empty"):
        prepare_waveform(np.zeros((0,), np.float64), 22050, 1)

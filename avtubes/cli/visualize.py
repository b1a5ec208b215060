"""CLI: qualitative visualization + overfit-one-sample harness (visualize.py).

Two modes of the reference's `visualize.py`:
  * default: run the model over eval videos/frames and dump heatmap/GT
    overlay JPEGs (save_image compositing) to --out_dir;
  * --overfit: repeatedly train on one sample and print per-step loss +
    cIoU — the classic can-it-learn-at-all debug loop
    (`visualize.py:91-118`).

Smoke:  python -m avtubes.cli.visualize --synthetic --overfit --steps 20
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.checkpoint import latest_checkpoint, restore_checkpoint
from avtubes.core.config import ExperimentConfig
from avtubes.data.index import load_split
from avtubes.data.pipeline import HardwayTestSource, SyntheticSource
from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
from avtubes.data.transforms import normalize_imagenet
from avtubes.evaluation import ciou_single, heatmap_to_mask_batch
from avtubes.train.evaluate import make_gt_lookup_auto
from avtubes.train.hardway import _synthetic_gt_lookup, build_model
from avtubes.train.state import create_train_state
from avtubes.train.steps import (
    eval_heatmap_shared_step,
    eval_heatmap_step,
    hardway_1frame_train_step,
)
from avtubes.utils.visual import overlay_heatmap


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    overfit = "--overfit" in argv
    if overfit:
        argv.remove("--overfit")
    whole_video = "--whole_video" in argv
    if whole_video:
        argv.remove("--whole_video")
    out_dir = "visualizations"
    if "--out_dir" in argv:
        i = argv.index("--out_dir")
        out_dir = argv[i + 1]
        del argv[i : i + 2]
    cfg = ExperimentConfig.from_args(argv)
    d = cfg.data
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)
    model = build_model(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, d.image_size, d.image_size, 3)),
         jnp.zeros((2, *spec_cfg.shape, 1))),
        cfg.optim)

    if d.synthetic:
        src = SyntheticSource(d, n=4, clip=False, seed=1)
        gt_lookup = _synthetic_gt_lookup()
    else:
        ids = load_split(d.metadata_dir, d.testset, "test_hardway")
        src = HardwayTestSource(d.og_data_path or d.data_path, ids, d)
        gt_lookup = make_gt_lookup_auto(d)

    steps = cfg.train.steps_cap or 20
    if overfit:
        sample = src.load(0)
        frames = normalize_imagenet(jnp.asarray(sample["frame"][None]))
        frames = jnp.tile(frames, (2, 1, 1, 1))  # B=2: hard-way needs a pair
        spec = log_spectrogram(jnp.asarray(sample["waveform"][None]), spec_cfg)
        spec = jnp.tile(spec[..., None], (2, 1, 1, 1))
        gt = gt_lookup(sample["id"], None)
        for step in range(steps):
            state, metrics = hardway_1frame_train_step(state, frames, spec)
            heat = eval_heatmap_step(state, frames, spec)
            mask = np.asarray(heatmap_to_mask_batch(heat))[0]
            print(f"step {step}: loss {float(metrics['loss']):.4f} "
                  f"ciou {ciou_single(mask, gt, 0.5):.4f}")
        return

    ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir,
                                                          "hardway16")
    if ckpt:
        state, _ = restore_checkpoint(ckpt, state)
        print(f"loaded {ckpt}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    if whole_video:
        # per-frame overlays over decoded test mp4s, one dir per video —
        # stitch to mp4 with avtubes.tools.convert_jpg_to_mp4
        # (the reference's PerFrameLabels qualitative path, visualize.py:119-158)
        from avtubes.data.pipeline import PerFrameEvalSource

        ids = load_split(d.metadata_dir, d.testset, "test")
        pf = PerFrameEvalSource(d.data_path, ids, d)
        for i in range(len(pf)):
            sample = pf.load(i)
            clip = sample["clip"]
            idxs = list(range(d.sampling_rate, clip.shape[0] - 1, d.sampling_rate))
            if not idxs:
                continue
            # pad the frame batch to a shape bucket: each distinct video
            # length would otherwise recompile the eval step (~30 s on TPU)
            from avtubes.train.evaluate import _pad_rows, bucket_len

            k = len(idxs)
            frames = normalize_imagenet(
                jnp.asarray(_pad_rows(clip[idxs], bucket_len(k))))
            spec1 = log_spectrogram(jnp.asarray(sample["waveform"]), spec_cfg)
            heat = eval_heatmap_shared_step(state, frames, spec1[None, ..., None])[:k]
            masks = np.asarray(heatmap_to_mask_batch(heat))
            vdir = out / sample["id"]
            vdir.mkdir(exist_ok=True)
            for j, fi in enumerate(idxs):
                img = overlay_heatmap(clip[fi], masks[j])
                Image.fromarray(img).save(vdir / f"{j}.jpg")
        print(f"wrote per-frame overlays for {len(pf)} videos to {out}/")
        return

    for i in range(len(src)):
        sample = src.load(i)
        frames = normalize_imagenet(jnp.asarray(sample["frame"][None]))
        spec = log_spectrogram(jnp.asarray(sample["waveform"][None]), spec_cfg)[..., None]
        heat = eval_heatmap_step(state, frames, spec)
        mask = np.asarray(heatmap_to_mask_batch(heat))[0]
        gt = gt_lookup(sample["id"], None)
        img = overlay_heatmap(sample["frame"], mask, gt)
        Image.fromarray(img).save(out / f"{sample['id']}.jpg")
    print(f"wrote {len(src)} overlays to {out}/")


if __name__ == "__main__":
    main()

"""CLI: quantitative eval — cIoU@0.5 + AUC on the hard-way test set.

Equivalent of the reference's `test.py` + `run_quantitative.sh` path: load a
checkpoint, run the hard-way test loader (flickr 249-image set or VGGSS
5158-clip set), print cIoU/AUC.  `--use_activation` additionally scores the
layer4 channel-mean activation map as an alternative predictor and keeps
the per-sample max (test.py:102-140 semantics).  Every run also prints the
center-Gaussian comparison column (test.py:93,106-107) — the gkern(14,5)
prior scored through the identical postprocess.

    python -m avtubes.cli.test_quantitative --testset flickr \
        --og_data_path ... --og_gt_path ... --summaries_dir ckpts/
    python -m avtubes.cli.test_quantitative --synthetic   # smoke
"""

import sys

import jax
import jax.numpy as jnp

from avtubes.core.checkpoint import latest_checkpoint, restore_checkpoint
from avtubes.core.config import ExperimentConfig
from avtubes.data.index import load_split
from avtubes.data.pipeline import BatchLoader, HardwayTestSource, SyntheticSource
from avtubes.data.spectrogram import SpectrogramConfig
from avtubes.train.evaluate import evaluate_hardway, make_gt_lookup_auto
from avtubes.train.hardway import _synthetic_gt_lookup, build_model
from avtubes.train.state import create_train_state


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    use_activation = "--use_activation" in argv
    if use_activation:
        argv.remove("--use_activation")
    tag = "hardway16"  # trainer tags: hardway16 | hardway1f | tube3d | flow
    if "--tag" in argv:
        i = argv.index("--tag")
        tag = argv[i + 1]
        del argv[i:i + 2]
    cfg = ExperimentConfig.from_args(argv)
    d = cfg.data
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)
    model_kind = "3d" if tag.startswith("tube") else "2d"
    if model_kind == "3d":
        from avtubes.models import FullModel

        dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        model = FullModel(hardway=cfg.hardway, dtype=dtype)
        init_args = (jnp.zeros((1, *spec_cfg.shape, 1)),
                     jnp.zeros((1, 1, d.image_size, d.image_size, 3)))
        assert not use_activation, "--use_activation is a 2D (AVENet) predictor"
    else:
        model = build_model(cfg)
        init_args = (jnp.zeros((1, d.image_size, d.image_size, 3)),
                     jnp.zeros((1, *spec_cfg.shape, 1)))
    state = create_train_state(model, jax.random.PRNGKey(0), init_args, cfg.optim)
    ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir, tag)
    if ckpt:
        state, epoch = restore_checkpoint(ckpt, state)
        print(f"loaded {ckpt} (epoch {epoch})")
    else:
        print("WARNING: no checkpoint found — evaluating a random-init model")

    if d.synthetic:
        src = SyntheticSource(d, n=8, clip=False, seed=1)
        gt_lookup = _synthetic_gt_lookup()
    else:
        ids = load_split(d.metadata_dir, d.testset, "test_hardway")
        src = HardwayTestSource(d.og_data_path or d.data_path, ids, d)
        gt_lookup = make_gt_lookup_auto(d)

    if isinstance(src, HardwayTestSource):
        from avtubes.data.pipeline import make_hardway_loader

        loader = make_hardway_loader(src.root, src.ids, d,
                                     batch_size=d.eval_batch_size,
                                     num_workers=d.n_threads)
    else:
        loader = BatchLoader(src, batch_size=min(d.eval_batch_size, len(src)),
                             num_workers=d.n_threads,
                             shuffle=False, drop_last=False)
    evaluated_ids: list = []
    if use_activation:
        metrics = _evaluate_with_activation(state, loader, d, spec_cfg, gt_lookup,
                                            evaluated_ids=evaluated_ids)
    else:
        # shard eval batches over every available chip (state replicated)
        from avtubes.core.mesh import make_data_mesh, replicate

        mesh = make_data_mesh(d.eval_batch_size)
        if mesh.size > 1:
            state = replicate(mesh, state)
        metrics = evaluate_hardway(state, loader, d, spec_cfg, gt_lookup,
                                   model_kind=model_kind,
                                   evaluated_ids=evaluated_ids,
                                   mesh=mesh if mesh.size > 1 else None)
    metrics.update(_gaussian_column(evaluated_ids, gt_lookup))
    print(f"Hardway Test cIoU  {metrics['hardway_ciou']}")
    print(f"Hardway Test auc   {metrics['hardway_auc']}")
    print(f"Center-gaussian comparison: cIoU {metrics['gaussian_ciou']:.4f}  "
          f"auc {metrics['gaussian_auc']:.4f}")
    return metrics


def _gaussian_column(evaluated_ids, gt_lookup):
    """Center-Gaussian comparison column (`test.py:93,106-107,144-148`):
    a gkern(14, std=5) prior, upsampled/normalized/median-binarized exactly
    like a model heatmap, scored against the same GT.  Scored over the ids
    the model eval actually decoded (not the whole split) so the two columns
    share a denominator — the reference scores the gaussian inside the same
    loader loop."""
    from avtubes.cli.baseline_gaussian import score_gaussian

    ciou, auc = score_gaussian(5.0, evaluated_ids, gt_lookup)
    return {"gaussian_ciou": ciou, "gaussian_auc": auc}


def _evaluate_with_activation(state, loader, d, spec_cfg, gt_lookup,
                              evaluated_ids: list | None = None):
    """Score both the similarity heatmap and the image-feature channel-mean
    activation map; keep max(ciou) per sample (test.py:102-140)."""
    import numpy as np

    from avtubes.data.spectrogram import log_spectrogram
    from avtubes.data.transforms import normalize_imagenet
    from avtubes.evaluation import auc_from_ciou, ciou_single, heatmap_to_mask_batch

    from avtubes.models.hardway import hardway_head

    def joint(m, f, s, train):
        img = m.encode_image(f, train=train)  # encoded once, used by both maps
        aud = m.encode_audio(s, train=train)
        return hardway_head(img, aud, m.hardway), img

    @jax.jit
    def both_maps(frames, spec):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out, feats = state.apply_fn(variables, frames, spec, train=False,
                                    method=joint)
        return out.heatmap, feats.mean(axis=-1)

    from avtubes.train.evaluate import _pad_rows

    cious = []
    full_bsz = getattr(loader, "batch_size", 0)
    for batch in loader.epoch(0):
        n = batch["frame"].shape[0]
        pad_to = full_bsz if 0 < n < full_bsz else n  # last partial batch:
        # keep the steady-state shape instead of compiling a second program
        frames = normalize_imagenet(jnp.asarray(_pad_rows(batch["frame"], pad_to)))
        spec = log_spectrogram(
            jnp.asarray(_pad_rows(batch["waveform"], pad_to)), spec_cfg)[..., None]
        heat, act = both_maps(frames, spec)
        masks_h = np.asarray(heatmap_to_mask_batch(heat))[:n]
        masks_a = np.asarray(heatmap_to_mask_batch(act))[:n]
        for i, vid in enumerate(batch["id"]):
            gt = gt_lookup(vid, None)
            cious.append(max(ciou_single(masks_h[i], gt, 0.5),
                             ciou_single(masks_a[i], gt, 0.5)))
            if evaluated_ids is not None:
                evaluated_ids.append(vid)
    cious = np.asarray(cious)
    return {"hardway_ciou": float(np.mean(cious >= 0.5)),
            "hardway_auc": auc_from_ciou(cious), "hardway_n": int(cious.size)}


if __name__ == "__main__":
    main()

"""CLI: quantitative eval — cIoU@0.5 + AUC on the hard-way test set.

Equivalent of the reference's `test.py` + `run_quantitative.sh` path: load a
checkpoint, run the hard-way test loader (flickr 249-image set or VGGSS
5158-clip set), print cIoU/AUC.

    python -m avtubes.cli.test_quantitative --testset flickr \
        --og_data_path ... --og_gt_path ... --summaries_dir ckpts/
    python -m avtubes.cli.test_quantitative --synthetic   # smoke
"""

import jax
import jax.numpy as jnp

from avtubes.core.checkpoint import latest_checkpoint, restore_checkpoint
from avtubes.core.config import ExperimentConfig
from avtubes.data.index import load_split
from avtubes.data.pipeline import BatchLoader, HardwayTestSource, SyntheticSource
from avtubes.data.spectrogram import SpectrogramConfig
from avtubes.evaluation import load_vggss_index
from avtubes.train.evaluate import evaluate_hardway, make_gt_lookup
from avtubes.train.hardway import _synthetic_gt_lookup, build_model
from avtubes.train.state import create_train_state


def main(argv=None):
    cfg = ExperimentConfig.from_args(argv)
    d = cfg.data
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)
    model = build_model(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((1, d.image_size, d.image_size, 3)), jnp.zeros((1, *spec_cfg.shape, 1))),
        cfg.optim,
    )
    ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir, "hardway16")
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
        vggss_index = None
        if d.testset == "vggss":
            vggss_index = load_vggss_index(f"{d.metadata_dir}/vggss.json")
        gt_lookup = make_gt_lookup(d, vggss_index=vggss_index)

    loader = BatchLoader(src, batch_size=8, num_workers=d.n_threads,
                         shuffle=False, drop_last=False)
    metrics = evaluate_hardway(state, loader, d, spec_cfg, gt_lookup)
    print(f"Hardway Test cIoU  {metrics['hardway_ciou']}")
    print(f"Hardway Test auc   {metrics['hardway_auc']}")
    return metrics


if __name__ == "__main__":
    main()

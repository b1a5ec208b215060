"""CLI: 16-frame hard-way training (reference `train_hardway.py` flags).

    python -m avtubes.cli.train_hardway --data_path ... --og_data_path ... \
        --og_gt_path ... --summaries_dir ckpts/ --batch_size 20

Smoke:  python -m avtubes.cli.train_hardway --synthetic --steps 3 --epochs 1
"""

from avtubes.core.config import ExperimentConfig
from avtubes.train.hardway import run


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from avtubes.core.distributed import maybe_initialize

    maybe_initialize()  # env-gated multi-host (AVTUBES_COORDINATOR=...)
    cfg = ExperimentConfig.from_args(argv)
    metrics = run(cfg, steps_cap=cfg.train.steps_cap)
    print("final:", metrics)


if __name__ == "__main__":
    main()

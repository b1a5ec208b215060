"""CLI: 3D tube training (reference `train_3D.py` flags).

Smoke:  python -m avtubes.cli.train_3d --synthetic --steps 2 --epochs 1 \
            --batch_size 2 --frame_density 2
"""

from avtubes.core.config import ExperimentConfig
from avtubes.train.train3d import run


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from avtubes.core.distributed import maybe_initialize

    if maybe_initialize():  # env-gated multi-host (AVTUBES_COORDINATOR=...)
        # only the flagship shards its dataset per process; running this
        # trainer multi-process would silently train on duplicated data
        raise SystemExit(
            "multi-host training is wired for avtubes.cli.train_hardway "
            "only; run this trainer single-process")
    cfg = ExperimentConfig.from_args(argv)
    metrics = run(cfg, steps_cap=cfg.train.steps_cap)
    print("final:", metrics)


if __name__ == "__main__":
    main()

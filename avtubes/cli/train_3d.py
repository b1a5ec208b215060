"""CLI: 3D tube training (reference `train_3D.py` flags).

Smoke:  python -m avtubes.cli.train_3d --synthetic --steps 2 --epochs 1 \
            --batch_size 2 --frame_density 2
"""

from avtubes.core.config import ExperimentConfig
from avtubes.train.train3d import run


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from avtubes.core.distributed import require_single_process

    require_single_process()  # env-gated multi-host is flagship-only
    cfg = ExperimentConfig.from_args(argv)
    metrics = run(cfg, steps_cap=cfg.train.steps_cap)
    print("final:", metrics)


if __name__ == "__main__":
    main()

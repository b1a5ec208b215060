"""CLI: single-frame hard-way training (reference `train_hardway_1frame.py`).

Smoke:  python -m avtubes.cli.train_hardway_1frame --synthetic --steps 2 \
            --epochs 1 --batch_size 2
"""

from avtubes.core.config import ExperimentConfig
from avtubes.train.hardway_1frame import run


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

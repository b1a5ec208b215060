"""CLI: flow-guided consistency training (reference `flow.py`).

Smoke:  python -m avtubes.cli.flow --synthetic --steps 2 --epochs 1 \
            --batch_size 2 --frame_density 2
"""

import sys

from avtubes.core.config import ExperimentConfig
from avtubes.train.flow import run


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    weight = 0.0
    if "--flow_loss_weight" in argv:
        i = argv.index("--flow_loss_weight")
        weight = float(argv[i + 1])
        del argv[i : i + 2]
    cfg = ExperimentConfig.from_args(argv)
    metrics = run(cfg, steps_cap=cfg.train.steps_cap,
                  flow_loss_weight=weight)
    print("final:", metrics)


if __name__ == "__main__":
    main()

"""CLI: flow-guided consistency training (reference `flow.py`).

Smoke:  python -m avtubes.cli.flow --synthetic --steps 2 --epochs 1 \
            --batch_size 2 --frame_density 2

--train_flow runs the unsupervised FlowNetLite pretraining loop instead
(photometric + smoothness on frame pairs) and writes `flownet_ep*`
checkpoints that the consistency trainer auto-loads.
"""

import sys

from avtubes.core.config import ExperimentConfig
from avtubes.train.flow import run


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from avtubes.core.distributed import require_single_process

    require_single_process()  # env-gated multi-host is flagship-only
    argv = list(sys.argv[1:] if argv is None else argv)
    weight = 0.0
    if "--flow_loss_weight" in argv:
        i = argv.index("--flow_loss_weight")
        weight = float(argv[i + 1])
        del argv[i : i + 2]
    train_flow = "--train_flow" in argv
    if train_flow:
        argv.remove("--train_flow")
    cfg = ExperimentConfig.from_args(argv)
    if train_flow:
        from avtubes.train.flow_pretrain import run_pretrain

        metrics = run_pretrain(cfg, steps_cap=cfg.train.steps_cap)
    else:
        metrics = run(cfg, steps_cap=cfg.train.steps_cap,
                      flow_loss_weight=weight)
    print("final:", metrics)


if __name__ == "__main__":
    main()

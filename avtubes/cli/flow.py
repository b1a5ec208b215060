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
    # --no_flow: drop the flow net + warp probe from the compiled program
    # entirely (only valid at weight 0; the reference always runs FlowNet2,
    # flow.py:127-153 — this is the TPU-native skip, +25% step rate measured
    # in scripts/bench_flow_step.py)
    compute_flow = "--no_flow" not in argv
    if not compute_flow:
        argv.remove("--no_flow")
    cfg = ExperimentConfig.from_args(argv)
    if train_flow:
        from avtubes.train.flow_pretrain import run_pretrain

        metrics = run_pretrain(cfg, steps_cap=cfg.train.steps_cap)
    else:
        metrics = run(cfg, steps_cap=cfg.train.steps_cap,
                      flow_loss_weight=weight, compute_flow=compute_flow)
    print("final:", metrics)


if __name__ == "__main__":
    main()

"""CLI wiring smoke tests: every entry point's main() runs end-to-end.

The trainer/eval internals are covered by dedicated tests; these pin the
argparse -> config -> run() plumbing of the entry points that had no direct
coverage (reference CLI surface: train_hardway_1frame.py, train_3D.py,
flow.py, visualize.py, test_hardway_dataset.py + the export CLI).
Everything runs synthetic at tiny shapes on CPU.
"""

import numpy as np


def _tiny(tmp_path, **over):
    args = {
        "--synthetic": None, "--image_size": "64", "--frame_density": "2",
        "--samplerate": "2000", "--audio_seconds": "1", "--n_threads": "2",
        "--batch_size": "2", "--epochs": "1", "--steps": "1",
        "--learning_rate": "1e-4", "--compute_dtype": "float32",
        "--summaries_dir": str(tmp_path),
    }
    args.update(over)
    flat = []
    for k, v in args.items():
        flat.append(k)
        if v is not None:
            flat.append(v)
    return flat


def test_train_hardway_1frame_cli(tmp_path, capsys):
    from avtubes.cli.train_hardway_1frame import main

    main(_tiny(tmp_path))
    assert "final:" in capsys.readouterr().out


def test_train_3d_cli(tmp_path, capsys):
    from avtubes.cli.train_3d import main

    main(_tiny(tmp_path, **{"--frame_density": "4", "--sampling_rate": "1"}))
    assert "final:" in capsys.readouterr().out


def test_flow_cli_with_weight(tmp_path, capsys):
    """Covers the --flow_loss_weight custom-flag parse and the consistency
    trainer path (reference flow.py)."""
    from avtubes.cli.flow import main

    main(_tiny(tmp_path) + ["--flow_loss_weight", "0.1"])
    assert "final:" in capsys.readouterr().out


def test_flow_cli_no_flow(tmp_path, capsys):
    """--no_flow drops the flow net from the compiled program at weight 0:
    the run completes and the warp probe reads exactly 0.0 (the step never
    computed it)."""
    from avtubes.cli.flow import main

    main(_tiny(tmp_path) + ["--no_flow"])
    out = capsys.readouterr().out
    assert "final:" in out
    assert "'warp_consistency': 0.0" in out


def test_flow_cli_pretrain(tmp_path, capsys):
    """Covers the --train_flow branch (FlowNetLite unsupervised pretrain)."""
    from avtubes.cli.flow import main

    main(_tiny(tmp_path) + ["--train_flow"])
    assert "final:" in capsys.readouterr().out


def test_baseline_gaussian_cli(tmp_path, capsys):
    """Center-Gaussian sweep (test_hardway_dataset.py parity): prints the
    quoted SOTA anchors and a best-std line with finite scores."""
    from avtubes.cli.baseline_gaussian import main

    main(["--synthetic"])
    out = capsys.readouterr().out
    assert "0.7349397590361446" in out  # test_hardway_dataset.py:88
    assert "best: std=" in out
    for line in out.splitlines():
        if line.startswith("std"):
            ciou = float(line.split("cIoU@0.5")[1].split()[0])
            assert np.isfinite(ciou) and 0.0 <= ciou <= 1.0


def test_visualize_overfit_cli(tmp_path, capsys):
    """The overfit-one-sample debug harness (reference visualize.py:91-118):
    per-step loss + cIoU prints."""
    from avtubes.cli.visualize import main

    main(_tiny(tmp_path, **{"--steps": "2"}) + ["--overfit"])
    out = capsys.readouterr().out
    steps = [l for l in out.splitlines() if l.startswith("step ")]
    assert len(steps) == 2
    assert "loss" in steps[0] and "ciou" in steps[0]


def test_export_model_cli_s2d(tmp_path, capsys):
    """Export CLI incl. the --s2d stem-conversion branch: writes a loadable
    StableHLO artifact whose output matches the live (plain-stem) model."""
    import jax.numpy as jnp

    from avtubes.cli.export_model import main
    from avtubes.core.export import load_localizer

    out = tmp_path / "model.avt"
    main(_tiny(tmp_path, **{"--batch": "2"})
         + ["--out", str(out), "--platforms", "cpu", "--s2d"])
    assert out.exists() and out.stat().st_size > 1e6
    assert "converted stems to space-to-depth layout" in capsys.readouterr().out

    fn = load_localizer(out.read_bytes())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8))
    wave = jnp.asarray(rng.random((2, 2000), np.float32))
    masks, heat = fn(img, wave)
    assert np.isfinite(np.asarray(heat)).all()
    assert set(np.unique(np.asarray(masks))) <= {0.0, 1.0}


def test_export_model_cli_validate(tmp_path, capsys):
    """--validate: exact export passes (exit 0, 'validate OK', the JSON
    report line); a tol of 0 on an int8 export trips the loud-warning
    SystemExit(2) path while keeping the artifact on disk."""
    import json

    import pytest

    from avtubes.cli.export_model import main

    out = tmp_path / "model.avt"
    main(_tiny(tmp_path, **{"--batch": "2"})
         + ["--out", str(out), "--platforms", "cpu", "--validate", "4"])
    captured = capsys.readouterr().out
    assert "validate OK" in captured
    report = json.loads(captured.split("validate: ", 1)[1].splitlines()[0])
    assert report["n"] == 4 and "ciou_delta" in report

    out_q = tmp_path / "model_q.avt"
    with pytest.raises(SystemExit) as exc:
        main(_tiny(tmp_path, **{"--batch": "2"})
             + ["--out", str(out_q), "--platforms", "cpu", "--quant", "int8",
                "--validate", "4", "--validate_tol", "-1"])
    assert exc.value.code == 2
    assert out_q.exists()  # artifact kept; the exit code gates CI
    assert "WARNING" in capsys.readouterr().out

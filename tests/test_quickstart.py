"""examples/quickstart.py must keep working (end-to-end lifecycle:
train -> export -> serve -> localize on synthetic data)."""

import sys
from pathlib import Path


def test_quickstart_runs(tmp_path, capsys):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    try:
        from quickstart import main
    finally:
        sys.path.pop(0)
    assert main(["--workdir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "full lifecycle OK" in out

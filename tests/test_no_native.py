"""AVTUBES_NO_NATIVE=1: the pure-Python fallback path, end to end.

Every native entry point has a Python fallback (PIL decode+resize, numpy
WAV + pocketfft spectrogram); this is the degradation path for platforms
without g++/libjpeg and the A/B tool for decode-parity debugging.  The
fallbacks run in subprocesses because get_lib() caches per process.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from avtubes import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_py(code: str, timeout: int = 600) -> str:
    env = dict(os.environ, AVTUBES_NO_NATIVE="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout, env=env, cwd=REPO)
    assert out.returncode == 0, f"stderr:\n{out.stderr[-2000:]}"
    return out.stdout


def test_kill_switch_disables_native():
    got = _run_py("from avtubes import native; print(native.available())")
    assert got.strip().splitlines()[-1] == "False"


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_fallback_eval_frame_bit_comparable(tmp_path):
    """host_load_eval_frame under the kill switch (PIL path) vs native
    (scaled=False full-res path): the two transforms are spec'd identical;
    tests/test_native.py pins the decode+resize parity at <=1 level, so the
    end-to-end frames must agree to the same tolerance."""
    from PIL import Image

    rng = np.random.RandomState(3)
    # a natural-ish image (smooth gradients) keeps bicubic ties rare
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    img = np.stack([(yy / 240 * 255), (xx / 320 * 255),
                    ((yy + xx) % 256)], -1).astype(np.uint8)
    p = tmp_path / "f.jpg"
    Image.fromarray(img).save(p, quality=95)

    from avtubes.data.transforms import host_load_eval_frame

    ours = host_load_eval_frame(p, image_size=96)
    npy = tmp_path / "fallback.npy"
    _run_py(
        "import numpy as np\n"
        "from avtubes.data.transforms import host_load_eval_frame\n"
        f"np.save({str(npy)!r}, host_load_eval_frame({str(p)!r}, image_size=96))\n"
    )
    theirs = np.load(npy)
    assert theirs.shape == ours.shape == (96, 96, 3)
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_fallback_trainer_end_to_end(tmp_path):
    """The flagship trainer must run (decode, spectrogram, train, eval)
    with the native core disabled — finite losses, zero skipped samples."""
    out = _run_py(
        "from avtubes.cli.train_hardway import main\n"
        "main(['--synthetic', '--steps', '1', '--epochs', '1',"
        " '--batch_size', '2', '--frame_density', '2', '--image_size', '64',"
        f" '--summaries_dir', {str(tmp_path / 'ck')!r}])\n",
        timeout=900,
    )
    final = [ln for ln in out.splitlines() if ln.startswith("final:")]
    assert final, f"no final metrics in output:\n{out[-2000:]}"
    assert "'skipped_samples': 0" in final[-1]
    # loss parsed finite
    loss = float(final[-1].split("'loss': ")[1].split(",")[0])
    assert np.isfinite(loss)

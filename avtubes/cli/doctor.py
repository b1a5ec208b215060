"""CLI: environment + dataset diagnostics ("is this box ready to train?").

No reference analog — operability tooling for production deployments.
Checks run in dependency order and each prints one PASS/WARN/FAIL line:

  toolchain   g++ / libjpeg present, native core builds and loads
  jax         backend reachable, device kind, device count
  metadata    split CSVs / vggss.json resolvable (vendored fallback)
  data        spot-decode of the first N samples of each referenced tree
  throughput  host decode rate on the spot-checked samples (clips/s/core)

Exit code: 0 all PASS/WARN, 1 any FAIL.

    python -m avtubes.cli.doctor [--data_path ...] [--og_data_path ...] \
        [--testset flickr] [--metadata_dir metadata] [--spot 8] [--skip_jax]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

_FAILED = False


def _report(status: str, name: str, detail: str) -> None:
    global _FAILED
    if status == "FAIL":
        _FAILED = True
    print(f"[{status:4s}] {name:10s} {detail}")


def check_toolchain() -> None:
    import shutil

    gxx = shutil.which("g++")
    if gxx is None:
        _report("WARN", "toolchain", "g++ not found - Python IO fallbacks only")
    from avtubes import native

    if native.available():
        _report("PASS", "toolchain", "native IO core loaded "
                f"({Path(native._LIB_PATH).name})")
    else:
        _report("WARN", "toolchain", "native core unavailable (build failed "
                "or AVTUBES_NO_NATIVE set) - Python fallbacks in use, host "
                "decode will be several times slower")


def check_jax() -> None:
    try:
        import jax

        devs = jax.devices()
        kinds = {d.device_kind for d in devs}
        _report("PASS", "jax", f"{len(devs)} device(s): {', '.join(sorted(kinds))} "
                f"(backend {jax.default_backend()})")
    except Exception as e:  # noqa: BLE001 - any init failure is the finding
        _report("FAIL", "jax", f"backend init failed: {e}")


def check_metadata(metadata_dir: str, testset: str) -> None:
    from avtubes.data.index import load_split, resolve_metadata_dir

    try:
        resolved = resolve_metadata_dir(metadata_dir)
    except Exception as e:  # noqa: BLE001
        _report("FAIL", "metadata", f"no metadata dir resolvable: {e}")
        return
    try:
        split = "test_hardway" if testset == "flickr" else "test"
        test_ids = load_split(resolved, testset, split)
        train_ids = load_split(resolved, testset, "train") if testset == "flickr" else []
        detail = f"{resolved}: {len(test_ids)} test ids"
        if train_ids:
            detail += f", {len(train_ids)} train ids"
        _report("PASS", "metadata", detail)
    except Exception as e:  # noqa: BLE001
        _report("FAIL", "metadata", f"split load failed from {resolved}: {e}")


def _spot_decode_train(data_path: Path, n: int) -> None:
    """Decode the first frames+audio of up to n training clips, timed."""
    import numpy as np

    from avtubes.data.transforms import host_load_train_clip

    vids = sorted((data_path / "videos").glob("*/"))[:n]
    if not vids:
        _report("FAIL", "data", f"{data_path}/videos has no clip directories")
        return
    rng = np.random.RandomState(0)
    ok = bad = 0
    t0 = time.perf_counter()
    for vd in vids:
        frames = sorted(vd.glob("*.jpg"))
        wav = data_path / "audio" / f"{vd.name.rstrip('/')}.wav"
        try:
            if not frames or not wav.exists():
                raise FileNotFoundError(f"{vd.name}: frames={len(frames)} "
                                        f"wav={wav.exists()}")
            host_load_train_clip([str(p) for p in frames], rng)
            from avtubes.data.audio import prepare_waveform, read_wav

            samples, sr = read_wav(wav)
            prepare_waveform(samples, sr, 10)
            ok += 1
        except Exception:  # noqa: BLE001 - counted, reported below
            bad += 1
    dt = time.perf_counter() - t0
    status = "PASS" if bad == 0 else ("WARN" if ok else "FAIL")
    rate = f", {ok / dt:.0f} clips/s/core decode" if ok and dt > 0 else ""
    _report(status, "data", f"train tree {data_path}: {ok}/{ok + bad} clips "
            f"spot-decoded{rate}")


def _spot_decode_eval(og_path: Path, n: int) -> None:
    from avtubes.data.transforms import host_load_eval_frame

    frames = sorted((og_path / "frames").glob("*.jpg"))[:n]
    if not frames:
        _report("FAIL", "data", f"{og_path}/frames has no JPEGs")
        return
    ok = bad = 0
    for p in frames:
        try:
            host_load_eval_frame(p)
            ok += 1
        except Exception:  # noqa: BLE001
            bad += 1
    status = "PASS" if bad == 0 else ("WARN" if ok else "FAIL")
    _report(status, "data", f"eval tree {og_path}: {ok}/{ok + bad} frames "
            "spot-decoded")


def main(argv=None) -> int:
    global _FAILED
    _FAILED = False
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="", help="training tree root")
    p.add_argument("--og_data_path", default="", help="hard-way eval tree root")
    p.add_argument("--testset", default="flickr")
    p.add_argument("--metadata_dir", default="metadata")
    p.add_argument("--spot", default=8, type=int, help="samples per tree")
    p.add_argument("--skip_jax", action="store_true",
                   help="skip backend init (it hangs if the device link is down)")
    a = p.parse_args(argv)

    check_toolchain()
    if a.skip_jax:
        _report("WARN", "jax", "skipped (--skip_jax)")
    else:
        check_jax()
    check_metadata(a.metadata_dir, a.testset)
    if a.data_path:
        _spot_decode_train(Path(a.data_path), a.spot)
    if a.og_data_path:
        _spot_decode_eval(Path(a.og_data_path), a.spot)
    if not a.data_path and not a.og_data_path:
        _report("WARN", "data", "no --data_path/--og_data_path given - "
                "data trees not checked")
    print("doctor:", "FAIL" if _FAILED else "OK")
    return 1 if _FAILED else 0


if __name__ == "__main__":
    sys.exit(main())

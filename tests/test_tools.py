"""Tooling tests: validation, URL matching, subset sampling, mp4 round-trips."""

import numpy as np
import pytest

from avtubes.data.audio import write_wav
from avtubes.tools.create_training_set import eligible_ids, sample_subsets
from avtubes.tools.download_flickr import match_urls_to_ids
from avtubes.tools.validate import good_audio, good_video, prune_corrupt_pairs

cv2 = pytest.importorskip("cv2")


def _write_mp4(path, frames=8, size=32):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (size, size))
    rng = np.random.RandomState(0)
    for _ in range(frames):
        writer.write(rng.randint(0, 255, (size, size, 3), dtype=np.uint8))
    writer.release()


def test_good_video_and_audio(tmp_path):
    mp4 = tmp_path / "v.mp4"
    _write_mp4(mp4)
    assert good_video(mp4)
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")
    assert not good_video(bad)

    wav = tmp_path / "a.wav"
    write_wav(wav, np.zeros(22050 * 2), 22050)
    assert good_audio(wav)
    short = tmp_path / "s.wav"
    write_wav(short, np.zeros(100), 22050)
    assert not good_audio(short)


def test_prune_corrupt_pairs(tmp_path):
    (tmp_path / "videos").mkdir()
    (tmp_path / "audio").mkdir()
    _write_mp4(tmp_path / "videos" / "good1.mp4")
    write_wav(tmp_path / "audio" / "good1.wav", np.zeros(44100), 22050)
    _write_mp4(tmp_path / "videos" / "noaudio.mp4")
    (tmp_path / "videos" / "corrupt.mp4").write_bytes(b"xx")
    write_wav(tmp_path / "audio" / "corrupt.wav", np.zeros(44100), 22050)

    bad = prune_corrupt_pairs(tmp_path, dry_run=True)
    assert sorted(bad) == ["corrupt", "noaudio"]
    assert (tmp_path / "videos" / "corrupt.mp4").exists()  # dry run keeps files
    prune_corrupt_pairs(tmp_path, dry_run=False)
    assert not (tmp_path / "videos" / "corrupt.mp4").exists()
    assert (tmp_path / "videos" / "good1.mp4").exists()


def test_match_urls_to_ids():
    urls = ["http://x.com/vid/12345_hd.mp4", "http://x.com/vid/99999.mp4"]
    m = match_urls_to_ids(urls, ["12345", "55555"])
    assert m == {"12345": "http://x.com/vid/12345_hd.mp4"}


def test_sample_subsets_deterministic_and_disjoint_from_exclude(tmp_path):
    (tmp_path / "videos").mkdir()
    (tmp_path / "audio").mkdir()
    for i in range(20):
        (tmp_path / "videos" / f"{i}.mp4").write_bytes(b"x")
        write_wav(tmp_path / "audio" / f"{i}.wav", np.zeros(100), 100)
    pool = eligible_ids(tmp_path, exclude={"3", "4"})
    assert "3" not in pool and len(pool) == 18
    s1 = sample_subsets(pool, [1], seed=7)
    s2 = sample_subsets(pool, [1], seed=7)
    assert s1 == s2  # deterministic


def test_convert_jpg_mp4_roundtrip(tmp_path):
    from PIL import Image

    from avtubes.tools.convert_jpg_to_mp4 import frames_to_mp4
    from avtubes.tools.convert_to_jpg import extract_clip

    fdir = tmp_path / "frames"
    fdir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            fdir / f"{i}.jpg")
    mp4 = tmp_path / "out.mp4"
    assert frames_to_mp4(fdir, mp4, fps=5) == 6
    assert good_video(mp4)

    out = tmp_path / "extracted"
    assert extract_clip(mp4, out, frames=4, stride=2)
    assert sorted(p.name for p in out.glob("*.jpg")) == ["0.jpg", "1.jpg", "2.jpg", "3.jpg"]


def test_profile_cli_smoke(tmp_path):
    """The profiler CLI runs a traced inference step and writes a trace dir."""
    from avtubes.cli.profile import main

    times = main(["--mode", "infer", "--steps", "2", "--batch_size", "2",
                  "--image_size", "64", "--samplerate", "2000",
                  "--audio_seconds", "1", "--logdir", str(tmp_path / "tr")])
    assert len(times) == 2 and all(t > 0 for t in times)
    assert any((tmp_path / "tr").rglob("*.xplane.pb"))


def test_doctor_synthetic_tree(tmp_path, capsys):
    from avtubes.cli.doctor import main
    from avtubes.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(tmp_path, n_videos=2)
    rc = main(["--data_path", str(tmp_path), "--og_data_path", str(tmp_path),
               "--metadata_dir", str(tmp_path / "metadata"),
               "--skip_jax", "--spot", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "doctor: OK" in out
    assert out.count("[PASS]") >= 3


def test_doctor_fails_on_missing_tree(tmp_path, capsys):
    from avtubes.cli.doctor import main

    (tmp_path / "videos").mkdir()
    rc = main(["--data_path", str(tmp_path), "--skip_jax"])
    out = capsys.readouterr().out
    assert rc == 1 and "doctor: FAIL" in out

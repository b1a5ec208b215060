"""Vendored benchmark metadata: the split CSVs + vggss.json ship in-repo
(`metadata/`), so a fresh clone can run the real Flickr/VGGSS protocols given
only the media files (reference `metadata/`: flickr_test_hardway.csv 249 ids,
vggss.json 5,158 entries — SURVEY.md §2.8)."""

import json

import pytest

from avtubes.data.index import VENDORED_METADATA, load_split, resolve_metadata_dir


def test_vendored_split_counts():
    assert VENDORED_METADATA.is_dir()
    assert len(load_split(VENDORED_METADATA, "flickr", "test_hardway")) == 249
    # 69/9 actual rows: the files lack a trailing newline, so `wc -l`
    # (SURVEY §2.8's "68/8") undercounts by one
    assert len(load_split(VENDORED_METADATA, "flickr", "test")) == 69
    assert len(load_split(VENDORED_METADATA, "flickr", "val")) == 9
    assert len(load_split(VENDORED_METADATA, "vggss", "test")) == 5158
    for subset, n in ((5, 5000), (10, 10000), (20, 20000), (144, 144000)):
        assert len(load_split(VENDORED_METADATA, "flickr", "train", subset)) == n


def test_vggss_json_vendored():
    entries = json.loads((VENDORED_METADATA / "vggss.json").read_text())
    assert len(entries) == 5158
    assert {"file", "class", "bbox"} <= set(entries[0])


def test_missing_dir_falls_back_to_vendored(tmp_path, monkeypatch):
    # the CLIs default to CWD-relative "metadata"; when THAT DEFAULT doesn't
    # exist (fresh clone run from anywhere) it resolves to the vendored copy
    # so load_split works out of the box
    monkeypatch.chdir(tmp_path)
    assert resolve_metadata_dir("metadata") == VENDORED_METADATA
    assert resolve_metadata_dir(tmp_path) == tmp_path  # existing dirs win
    ids = load_split("metadata", "flickr", "test_hardway")
    assert len(ids) == 249 and ids[0] == "10000130166"
    # an EXPLICIT nonexistent dir is an error (silent fallback to the
    # vendored benchmark splits would mask a typo'd --metadata_dir)
    with pytest.raises(FileNotFoundError):
        resolve_metadata_dir(tmp_path / "nope")

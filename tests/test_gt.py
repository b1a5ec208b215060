"""GT rasterizer tests against tiny XML/JSON fixtures."""

import json

import numpy as np

from avtubes.evaluation import flickr_gt_from_xml, load_vggss_index, vggss_gt_from_bboxes

FLICKR_XML = """<annotation>
  <file>12345</file>
  <object>
    <bbox><annotator>1</annotator><xmin>64</xmin><ymin>32</ymin><xmax>192</xmax><ymax>160</ymax></bbox>
    <bbox><annotator>2</annotator><xmin>0</xmin><ymin>0</ymin><xmax>128</xmax><ymax>128</ymax></bbox>
  </object>
</annotation>
"""


def _scale(v):
    return int(224 * v / 256)


def test_flickr_whole_video_soft_map(tmp_path):
    p = tmp_path / "12345.xml"
    p.write_text(FLICKR_XML)
    gt = flickr_gt_from_xml(p, per_frame=False)
    # box1 only region: value 0.5; overlap of box1 & box2: 1.0; outside: 0
    x0, y0, x1, y1 = _scale(64), _scale(32), _scale(192), _scale(160)
    assert gt[y0, x1 - 1] == 0.5          # inside box1 only (right edge col)
    assert gt[y0 + 1, x0 + 1] == 1.0      # inside both
    assert gt[223, 223] == 0.0
    assert gt.max() <= 1.0


def test_flickr_per_frame_raw_sum(tmp_path):
    p = tmp_path / "12345_16.xml"
    p.write_text(FLICKR_XML)
    gt = flickr_gt_from_xml(p, per_frame=True)
    # per-frame variant keeps the raw sum (no /2, no clip)
    x0, y0 = _scale(64), _scale(32)
    assert gt[y0 + 1, x0 + 1] == 2.0
    assert gt[0, 0] == 1.0  # box2 only


def test_vggss_union_binary():
    bboxes = [[0.0, 0.0, 0.5, 0.5], [0.25, 0.25, 0.75, 0.75]]
    gt = vggss_gt_from_bboxes(bboxes)
    assert gt.max() == 1.0
    assert gt[0, 0] == 1.0
    assert gt[int(224 * 0.6), int(224 * 0.6)] == 1.0
    assert gt[223, 223] == 0.0
    # negative coords clamp to 0 like the reference's max(x, 0)
    gt2 = vggss_gt_from_bboxes([[-0.1, -0.1, 0.25, 0.25]])
    assert gt2[0, 0] == 1.0


def test_vggss_index(tmp_path):
    entries = [{"file": "abc_000001", "class": "dog", "bbox": [[0, 0, 1, 1]]}]
    p = tmp_path / "vggss.json"
    p.write_text(json.dumps(entries))
    idx = load_vggss_index(p)
    assert idx["abc_000001"] == [[0, 0, 1, 1]]
    gt = vggss_gt_from_bboxes(idx["abc_000001"])
    assert np.all(gt == 1.0)

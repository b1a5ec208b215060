"""Evaluation: cIoU / AUC / mTC metrics, GT rasterizers, heatmap postprocess."""

from avtubes.evaluation.metrics import Evaluator, ciou_single, success_curve, auc_from_ciou, mtc
from avtubes.evaluation.gt import flickr_gt_from_xml, vggss_gt_from_bboxes, load_vggss_index
from avtubes.evaluation.postprocess import heatmap_to_mask, heatmap_to_mask_batch, normalize_minmax

__all__ = [
    "Evaluator",
    "ciou_single",
    "success_curve",
    "auc_from_ciou",
    "mtc",
    "flickr_gt_from_xml",
    "vggss_gt_from_bboxes",
    "load_vggss_index",
    "heatmap_to_mask",
    "heatmap_to_mask_batch",
    "normalize_minmax",
]

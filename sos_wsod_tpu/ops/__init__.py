"""TPU-native kernel library (reference CUDA/C++ inventory: SURVEY.md §2.3)."""
from .csc import csc, csc_constraint
from .deform_conv import deform_conv2d
from .dense_crf import dense_crf
from .nms import batched_nms_mask, nms_mask
from .pcl_loss import pcl_loss
from .roi_align import roi_align
from .roi_label import roi_label
from .roi_loop_pool import roi_loop_pool
from .roi_merge import roi_merge
from .roi_pool import roi_pool
from .rotated import (batched_nms_rotated, nms_rotated_mask,
                      pairwise_iou_rotated)

__all__ = [
    "csc", "csc_constraint", "deform_conv2d", "dense_crf",
    "batched_nms_mask", "nms_mask", "pcl_loss", "roi_align", "roi_label",
    "roi_loop_pool", "roi_merge", "roi_pool", "batched_nms_rotated",
    "nms_rotated_mask", "pairwise_iou_rotated",
]

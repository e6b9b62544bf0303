from .anchors import YOLOV5_ANCHORS, feature_map_shape, make_grid, pyramid_anchors
from .boxes import (
    box_candidates,
    tblr2xyxy,
    unletterbox_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2tblr,
    xyxy2xywh,
    xyxy2xywhn,
)
from .iou import ciou, diou, giou, iou, pairwise_iou
from .preprocess import device_letterbox_normalize, letterbox_plan
from .letterbox import (
    LetterboxInfo,
    letterbox_boxes,
    letterbox_image,
    unletterbox_boxes_np,
)
from .kmeans_anchors import kmeans_anchors
from .metrics import ConfusionMatrix, DetectionMetrics, compute_ap, compute_tp, pairwise_iou_np
from .nms import (
    greedy_nms,
    nms_candidates,
    postprocess_detections,
    select_topk_candidates,
    soft_nms,
)
from .wbf import weighted_boxes_fusion

from .meters import AverageMeter, MeterBuffer
from .visualize import (COCO_NAMES, VOC_NAMES, class_colors, detection_report, draw_detections, save_detection_image, save_pred_vs_gt)
from .summary import format_hyp_table, summarize_model

from .common import bce_with_logits, focal_loss_factor, smooth_bce_targets
from .yolov5 import YOLOv5LossConfig, initial_balances, yolov5_loss
from .yolox import YOLOXLossConfig, yolox_initial_balances, yolox_loss
from .retinanet import RetinaNetLossConfig, retinanet_loss
from .yolov8 import YOLOv8LossConfig, yolov8_loss
from .yolov7 import YOLOv7LossConfig, yolov7_loss
from .fcos import FCOSLossConfig, fcos_loss

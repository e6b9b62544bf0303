from .yolov5 import (EvalConfig, Evaluator, decode_topk_yolov5, decode_yolov5,
                     scale_and_pad)
from .yolox import decode_topk_yolox, decode_yolox
from .retinanet import decode_retinanet, decode_topk_retinanet
from .yolov8 import decode_topk_yolov8, decode_yolov8
from .fcos import decode_fcos, decode_topk_fcos

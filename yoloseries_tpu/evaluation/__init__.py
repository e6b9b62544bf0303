from .yolov5 import EvalConfig, Evaluator, decode_yolov5, scale_and_pad
from .yolox import decode_yolox
from .retinanet import decode_retinanet

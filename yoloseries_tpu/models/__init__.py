from .registry import available_models, create_model, register
from .fcos import FCOS, FCOSCSPNet
from .retinanet import ResNetBackbone, RetinaNet
from .yolov5 import CSPTrunk, YOLOV5_SIZES, YOLOv5, YOLOv5Spec
from .yolov7 import YOLOv7
from .yolov8 import YOLOv8
from .yolox import YOLOX, YOLOX_SIZES, YOLOXDarknet


def _register_yolov5():
    for size in YOLOV5_SIZES:
        name = f"yolov5{size}"

        def make(num_class, _size=size, **kw):
            return YOLOv5(num_class=num_class, spec=YOLOV5_SIZES[_size], **kw)

        register(name)(make)


def _register_yolox():
    for size in YOLOX_SIZES:
        name = f"yolox_{size}"

        def make(num_class, _size=size, **kw):
            return YOLOX(num_class=num_class, spec=YOLOX_SIZES[_size], **kw)

        register(name)(make)

    register("yolox_darknet53")(
        lambda num_class, **kw: YOLOXDarknet(
            num_class=num_class, num_blocks=(1, 2, 8, 8, 4), **kw
        )
    )
    register("yolox_darknet21")(
        lambda num_class, **kw: YOLOXDarknet(
            num_class=num_class, num_blocks=(1, 1, 2, 2, 1), **kw
        )
    )


def _register_retinanet():
    register("retinanet")(
        lambda num_class, **kw: RetinaNet(num_class=num_class, **kw)
    )
    register("retinanet_experiment")(
        lambda num_class, **kw: RetinaNet(
            num_class=num_class, with_objectness=True, **kw
        )
    )


def _register_yolov7():
    register("yolov7")(lambda num_class, **kw: YOLOv7(num_class=num_class, **kw))


def _register_yolov8():
    register("yolov8")(lambda num_class, **kw: YOLOv8(num_class=num_class, **kw))
    for name, scale in (("yolov8n", 0.34), ("yolov8s", 0.5), ("yolov8m", 1.0)):
        register(name)(
            lambda num_class, _s=scale, **kw: YOLOv8(
                num_class=num_class, scale=_s, **kw
            )
        )


def _register_fcos():
    register("fcos")(lambda num_class, **kw: FCOS(num_class=num_class, **kw))
    register("fcos_cspnet")(
        lambda num_class, **kw: FCOSCSPNet(num_class=num_class, **kw)
    )


_register_yolov5()
_register_yolov7()
_register_yolov8()
_register_yolox()
_register_retinanet()
_register_fcos()

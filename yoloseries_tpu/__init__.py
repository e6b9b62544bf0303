"""yoloseries_tpu — a TPU-native object-detection framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of yl-jiang/YOLOSeries (PyTorch/CUDA)
designed TPU-first:

* models compile to XLA with NHWC layouts and static shapes,
* label assignment is vectorized into fixed-shape masked computations under jit,
* the inference hot path (decode + NMS) runs on device,
* data parallelism is a `jax.sharding.Mesh` + NamedSharding over the batch axis,
* BN-stat sync is a pmean over state leaves, checkpoints are orbax pytrees.

Subpackages
-----------
ops         pure jnp box math, IoU family, anchors, decode, NMS, mAP
nn          flax.linen layer zoo (ConvBnAct, CSP blocks, SPP family, heads, ...)
models      detector families (yolov5 s/m/l/x, yolov7, yolov8, yolox, retinanet, fcos)
losses      label assigners + losses, dense fixed-shape formulations
data        host-side dataset / augmentation / fixed-shape batching pipeline
train       trainer, optimizer groups, EMA, schedules, checkpointing
evaluation  decode + TTA + NMS evaluators, host mAP
parallel    device mesh and sharding helpers
kernels     Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"

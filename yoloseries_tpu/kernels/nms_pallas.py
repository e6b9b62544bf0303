"""Pallas TPU kernel: batched greedy NMS with VMEM-resident candidates.

The XLA version (ops/nms.py greedy_nms) runs max_keep sequential scan steps,
each a separate fused loop body touching HBM. This kernel keeps the whole
candidate set in VMEM and runs the greedy argmax-suppress loop on-chip:

* boxes are passed as four separate (B, K) coordinate planes — a (B, K, 4)
  layout would pad the 4-wide lane axis to 128 and blow VMEM 32x,
* per iteration: row-wise argmax via max+compare (VPU), the selected box
  extracted with one-hot reductions instead of gathers, an IoU row against
  all K candidates, in-place suppression,
* keep indices accumulate through the fori_loop carry with a column mask
  (Mosaic does not support dynamic lane-dim stores).

Semantics match ops/nms.py:greedy_nms exactly (suppress at IoU >= thr,
explicit self-zeroing, -1 padding) — see tests/test_nms_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_greedy_nms"]


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, thr_ref,
                keep_idx_ref, keep_valid_ref, *, max_keep: int):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    k = x1.shape[1]
    thr = thr_ref[0]
    area = (x2 - x1) * (y2 - y1)  # (Bt, K)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores_ref.shape, 1)  # (Bt, K)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, keep_idx_ref.shape, 1)

    def body(carry):
        i, live, acc_idx, acc_valid = carry
        best = jnp.max(live, axis=1, keepdims=True)  # (Bt, 1)
        valid = best > 0.0
        # leftmost argmax as a one-hot row
        is_best = live == best
        first = jnp.min(jnp.where(is_best, col_ids, k), axis=1, keepdims=True)
        onehot = (col_ids == first).astype(jnp.float32)  # (Bt, K)

        bx1 = jnp.sum(onehot * x1, axis=1, keepdims=True)
        by1 = jnp.sum(onehot * y1, axis=1, keepdims=True)
        bx2 = jnp.sum(onehot * x2, axis=1, keepdims=True)
        by2 = jnp.sum(onehot * y2, axis=1, keepdims=True)
        barea = jnp.sum(onehot * area, axis=1, keepdims=True)

        iw = jnp.clip(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0)
        ih = jnp.clip(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        inter = iw * ih
        iou = inter / jnp.clip(barea + area - inter, 1e-9)

        suppress = (iou >= thr) & valid
        live = jnp.where(suppress, 0.0, live)
        live = jnp.where(onehot > 0, 0.0, live)  # zero the keeper explicitly

        idx_out = jnp.where(valid, first, -1).astype(jnp.int32)
        slot = out_cols == i
        acc_idx = jnp.where(slot, idx_out, acc_idx)
        acc_valid = jnp.where(slot, valid.astype(jnp.int32), acc_valid)
        return i + 1, live, acc_idx, acc_valid

    def cond(carry):
        # early exit once every row in the tile is exhausted: at serving
        # confidence thresholds most images keep a few dozen boxes, so this
        # cuts the 300-iteration bound to the actual keep count
        i, live, _, _ = carry
        return (i < max_keep) & (jnp.max(live) > 0.0)

    init = (
        jnp.zeros((), jnp.int32),
        scores_ref[:],
        jnp.full(keep_idx_ref.shape, -1, jnp.int32),
        jnp.zeros(keep_valid_ref.shape, jnp.int32),
    )
    _, _, keep_idx, keep_valid = jax.lax.while_loop(cond, body, init)
    keep_idx_ref[:] = keep_idx
    keep_valid_ref[:] = keep_valid


@functools.partial(jax.jit, static_argnames=("max_keep", "tile_b", "interpret"))
def pallas_greedy_nms(boxes, scores, iou_threshold, max_keep: int = 300,
                      tile_b: int = 32, interpret: bool = False):
    """Batched greedy NMS on TPU.

    boxes (B, K, 4) xyxy; scores (B, K) with 0 marking dead slots; returns
    (keep_idx (B, max_keep) int32 with -1 padding, keep_valid (B, max_keep)
    bool). K should be a multiple of 128 for lane alignment.
    """
    b, k = scores.shape
    tile_b = min(tile_b, max(8, b))
    pad_b = (-b) % tile_b
    if pad_b:
        boxes = jnp.pad(boxes, ((0, pad_b), (0, 0), (0, 0)))
        scores = jnp.pad(scores, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    thr = jnp.full((1,), iou_threshold, jnp.float32)

    boxes = boxes.astype(jnp.float32)
    planes = [boxes[:, :, i] for i in range(4)]

    plane_spec = pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    keep_idx, keep_valid = pl.pallas_call(
        functools.partial(_nms_kernel, max_keep=max_keep),
        grid=(bp // tile_b,),
        in_specs=[plane_spec] * 5 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((tile_b, max_keep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, max_keep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, max_keep), jnp.int32),
            jax.ShapeDtypeStruct((bp, max_keep), jnp.int32),
        ],
        interpret=interpret,
    )(*planes, scores.astype(jnp.float32), thr)

    return keep_idx[:b], keep_valid[:b].astype(bool)

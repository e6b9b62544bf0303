"""Pallas TPU kernel: exact greedy NMS via an iterative set refinement over
a VMEM-resident pairwise-IoU matrix.

The streaming kernel (kernels/nms_pallas.py) runs ONE sequential
argmax-suppress step per keeper — up to ``max_keep`` (300) dependent
iterations, which dominates small-batch latency. This kernel instead
materializes the (K, K) IoU-suppression matrix once in VMEM and refines a
keep/undecided partition:

  round:  confirm  U-candidates with no earlier U-suppressor  -> D
          kill     U-candidates suppressed by a D-member

Every round confirms at least the highest-priority undecided candidate, so
the loop terminates in at most #keepers rounds, and in practice in the
suppression-chain depth (single digits for real detections). The fixpoint
is exactly the sequential greedy result: suppress at IoU >= thr, priority =
descending score with ties to the lower index, matching the streaming
kernel's leftmost-argmax and ops/nms.py:greedy_nms — unsorted inputs (the
TTA path concatenates per-branch sorted blocks) are handled.

VMEM budget: tile_b * K^2 * 4 bytes for the suppression matrix — K <= 1024
with a small batch tile. ``nms_candidates`` dispatches here for the
small-batch/serving-K regime and to the streaming kernel otherwise.

Reference equivalent: utils/nms.py numba_nms (sequential greedy on host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_matrix_nms"]


def _matrix_nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, thr_ref,
                       keep_idx_ref, keep_valid_ref, *, max_keep: int):
    # refs are (Bt, 1, K): the unit middle dim makes the block's last two
    # dims equal to the array's, satisfying Pallas TPU's (8, 128)
    # block-divisibility rule for any Bt
    x1 = x1_ref[:, 0, :]  # (Bt, K)
    y1 = y1_ref[:, 0, :]
    x2 = x2_ref[:, 0, :]
    y2 = y2_ref[:, 0, :]
    scores = scores_ref[:, 0, :]
    bt, k = scores.shape
    thr = thr_ref[0]

    area = (x2 - x1) * (y2 - y1)  # (Bt, K)
    # pairwise IoU (Bt, J, I): row j = potential suppressor, col i = victim
    iw = jnp.clip(
        jnp.minimum(x2[:, :, None], x2[:, None, :])
        - jnp.maximum(x1[:, :, None], x1[:, None, :]),
        0.0,
    )
    ih = jnp.clip(
        jnp.minimum(y2[:, :, None], y2[:, None, :])
        - jnp.maximum(y1[:, :, None], y1[:, None, :]),
        0.0,
    )
    inter = iw * ih
    iou = inter / jnp.clip(area[:, :, None] + area[:, None, :] - inter, 1e-9)

    # priority: higher score first, ties to the lower index — matches the
    # streaming kernel's leftmost-argmax and works for unsorted inputs
    # (e.g. the TTA path concatenates per-branch sorted blocks)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, k, k), 1)
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, k, k), 2)
    s_j, s_i = scores[:, :, None], scores[:, None, :]
    pri = (s_j > s_i) | ((s_j == s_i) & (j_ids < i_ids))  # j before i
    sup = (iou >= thr) & pri
    supf = sup.astype(jnp.float32)
    prif = pri.astype(jnp.float32)

    # the while_loop carries f32 {0,1} masks, not bools: Mosaic cannot
    # legalize scf.yield of padded i1 vectors on TPU
    live = (scores > 0.0).astype(jnp.float32)  # (Bt, K)

    def body(carry):
        undecided, kept = carry  # f32 {0,1} (Bt, K)
        # blocked_i: some undecided earlier j could still suppress i
        blocked = (
            jnp.sum(supf * undecided[:, :, None], axis=1) > 0.0
        ).astype(jnp.float32)  # (Bt, K)
        kept2 = jnp.maximum(kept, undecided * (1.0 - blocked))
        killed = (
            jnp.sum(supf * kept2[:, :, None], axis=1) > 0.0
        ).astype(jnp.float32)
        undecided2 = undecided * blocked * (1.0 - killed)
        return undecided2, kept2

    def cond(carry):
        undecided, _ = carry
        return jnp.sum(undecided) > 0.0

    _, keptf = jax.lax.while_loop(cond, body, (live, jnp.zeros_like(live)))

    # emit the first max_keep kept indices in PRIORITY (greedy-selection)
    # order: a keeper's rank is the number of kept boxes before it
    rank = jnp.sum(prif * keptf[:, :, None], axis=1)  # (Bt, K)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, k), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (bt, max_keep), 1)

    # slot s <- index of the kept candidate with rank s (one-hot reduction;
    # K x max_keep fits comfortably). All-f32 arithmetic: Mosaic only
    # supports minor-dim insertion (x[:, :, None]) on 32-bit types, so the
    # kept mask enters as keptf, never as an i1 broadcast.
    slot_hot = (
        rank[:, :, None] == out_cols[:, None, :].astype(jnp.float32)
    ).astype(jnp.float32) * keptf[:, :, None]  # (Bt, K, max_keep)
    idx_out = jnp.sum(slot_hot * col_ids[:, :, None].astype(jnp.float32), axis=1)
    valid_out = jnp.sum(slot_hot, axis=1) > 0.0  # (Bt, max_keep)

    keep_idx_ref[:, 0, :] = jnp.where(
        valid_out, idx_out.astype(jnp.int32), -1
    )
    keep_valid_ref[:, 0, :] = valid_out.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("max_keep", "tile_b", "interpret")
)
def pallas_matrix_nms(boxes, scores, iou_threshold, max_keep: int = 300,
                      tile_b: int = 4, interpret: bool = False):
    """Exact greedy NMS, matrix formulation (see module docstring).

    boxes (B, K, 4) xyxy (any order); scores (B, K) with 0 marking dead
    slots. Returns (keep_idx (B, max_keep) int32 in greedy-selection order,
    -1 padded; keep_valid (B, max_keep) bool). Use for K <= ~1024.
    """
    b, k = scores.shape
    tile_b = max(1, min(tile_b, b))
    pad_b = (-b) % tile_b
    if pad_b:
        boxes = jnp.pad(boxes, ((0, pad_b), (0, 0), (0, 0)))
        scores = jnp.pad(scores, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    thr = jnp.full((1,), iou_threshold, jnp.float32)

    # (B, 1, K) planes: the unit middle dim makes each block's last two
    # dims equal the array's, which Pallas TPU accepts for any tile_b
    boxes = boxes.astype(jnp.float32)
    planes = [boxes[:, None, :, i] for i in range(4)]

    plane_spec = pl.BlockSpec((tile_b, 1, k), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    keep_idx, keep_valid = pl.pallas_call(
        functools.partial(_matrix_nms_kernel, max_keep=max_keep),
        grid=(bp // tile_b,),
        in_specs=[plane_spec] * 5 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((tile_b, 1, max_keep), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1, max_keep), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1, max_keep), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1, max_keep), jnp.int32),
        ],
        # the working set is ~4 x tile_b x K^2 f32 (iou/sup/pri + one body
        # temporary) — beyond the default 16 MiB scoped-vmem budget at
        # K=1024, well inside v5e's 128 MiB VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*planes, scores[:, None, :].astype(jnp.float32), thr)

    return keep_idx[:b, 0], keep_valid[:b, 0].astype(bool)

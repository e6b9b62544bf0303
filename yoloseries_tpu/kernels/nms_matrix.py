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

__all__ = ["pallas_matrix_nms", "pallas_matrix_nms_chunked"]


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


def _iou_pairwise(a, b):
    """IoU between (B, M, 4) and (B, C, 4) xyxy -> (B, M, C); matches
    ops/nms.py:_iou_one_vs_all (clip eps 1e-9, zero-area -> 0)."""
    lt = jnp.maximum(a[:, :, None, 0:2], b[:, None, :, 0:2])
    rb = jnp.minimum(a[:, :, None, 2:4], b[:, None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.clip(area_a[:, :, None] + area_b[:, None, :] - inter,
                            1e-9)


@functools.partial(
    jax.jit, static_argnames=("max_keep", "chunk", "tile_b", "interpret")
)
def pallas_matrix_nms_chunked(boxes, scores, iou_threshold, max_keep: int = 300,
                              chunk: int = 1024, tile_b: int = 4,
                              interpret: bool = False):
    """Exact greedy NMS at candidate counts beyond the single-kernel VMEM
    gate (K > 1024, e.g. the certified 4096-candidate eval protocol).

    The (K, K) suppression matrix at K=4096 is 64 MB/image — far past VMEM.
    Instead: sort candidates globally by priority (score desc, stable — ties
    keep the lower original index, greedy_nms's leftmost-argmax), process
    1024-wide strips in priority order with :func:`pallas_matrix_nms`, and
    carry the keeper set between strips:

      strip c:  kill candidates overlapping a carried keeper (IoU >= thr)
                -> matrix NMS within the surviving strip
                -> append strip keepers to the carry (priority order)

    Exactness: a strip candidate's greedy fate depends only on keepers of
    higher priority, all of which live in strips <= c; the carry truncates at
    ``max_keep`` keepers, after which every later candidate's rank exceeds
    ``max_keep`` and cannot reach the output. Keep order across strips is
    global priority order, matching the single-kernel path.

    Same contract as :func:`pallas_matrix_nms`; returns indices into the
    ORIGINAL (unsorted) candidate axis.
    """
    b, k = scores.shape
    if k <= chunk:
        return pallas_matrix_nms(boxes, scores, iou_threshold,
                                 max_keep=max_keep, tile_b=tile_b,
                                 interpret=interpret)
    pad = (-k) % chunk
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))  # score 0 = dead slot
    kp = k + pad

    order = jnp.argsort(-scores, axis=-1, stable=True)  # (B, Kp)
    sb = jnp.take_along_axis(boxes, order[..., None], axis=1)
    ss = jnp.take_along_axis(scores, order, axis=1)

    carry_box = jnp.zeros((b, max_keep, 4), jnp.float32)
    carry_idx = jnp.full((b, max_keep), -1, jnp.int32)  # into the SORTED axis
    carry_valid = jnp.zeros((b, max_keep), bool)

    for c in range(kp // chunk):
        cb = sb[:, c * chunk:(c + 1) * chunk]
        cs = ss[:, c * chunk:(c + 1) * chunk]
        if c > 0:
            killed = jnp.any(
                (_iou_pairwise(carry_box, cb) >= iou_threshold)
                & carry_valid[..., None],
                axis=1,
            )
            cs = jnp.where(killed, 0.0, cs)
        kidx, kval = pallas_matrix_nms(cb, cs, iou_threshold,
                                       max_keep=max_keep, tile_b=tile_b,
                                       interpret=interpret)
        kidx = jnp.where(kval, kidx + c * chunk, -1)
        kbox = jnp.take_along_axis(sb, jnp.maximum(kidx, 0)[..., None], axis=1)
        # append strip keepers after the carried ones, then compact the
        # valid slots to the front (stable — preserves priority order) and
        # retruncate to max_keep
        all_idx = jnp.concatenate([carry_idx, kidx], axis=1)
        all_val = jnp.concatenate([carry_valid, kval], axis=1)
        all_box = jnp.concatenate([carry_box, kbox], axis=1)
        compact = jnp.argsort(~all_val, axis=-1, stable=True)
        carry_idx = jnp.take_along_axis(all_idx, compact, axis=1)[:, :max_keep]
        carry_valid = jnp.take_along_axis(all_val, compact, axis=1)[:, :max_keep]
        carry_box = jnp.take_along_axis(
            all_box, compact[..., None], axis=1
        )[:, :max_keep]

    orig = jnp.take_along_axis(order, jnp.maximum(carry_idx, 0), axis=1)
    keep_idx = jnp.where(carry_valid, orig.astype(jnp.int32), -1)
    return keep_idx, carry_valid

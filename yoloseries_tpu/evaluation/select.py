"""Shared machinery for the fused candidate-selection (`decode_topk_*`)
paths: one global top-k over stage-concatenated score planes, then sparse
masked gathers of the K winning rows from each stage's raw tensors.

Every family's fused path has the same two-pass shape (see
`decode_topk_yolov5` for the rationale and HBM-traffic numbers); only the
score formula and the box transform differ, so those stay per-family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["topk_gather"]


def topk_gather(stage_scores, k, groups):
    """Global top-k + sparse per-stage row gathers.

    Args:
      stage_scores: list of (B, Ns) f32 score planes, one per stage; zeros
        mark gated/dead slots. Concatenation order defines the global index
        space (must match the family's dense decode concat order).
      k: number of candidates to keep (clamped to the total N).
      groups: list of per-stage tensor lists; ``groups[g][s]`` has shape
        (B, Ns_s, Cg). For each group, the rows at the winning global
        indices are gathered into one (B, K, Cg) tensor.

    Returns:
      (score_k (B, K), idx_k (B, K) global indices, gathered) where
      ``gathered[g]`` is the (B, K, Cg) row tensor for ``groups[g]``.
    """
    scores = jnp.concatenate(stage_scores, axis=1)  # (B, N)
    kf = min(k, scores.shape[-1])
    score_k, idx_k = jax.lax.top_k(scores, kf)

    offsets, ns_list = [], []
    offset = 0
    for s in stage_scores:
        offsets.append(offset)
        ns_list.append(s.shape[1])
        offset += s.shape[1]

    gathered = []
    for group in groups:
        out = jnp.zeros(
            (scores.shape[0], kf, group[0].shape[-1]), group[0].dtype
        )
        for si, stage in enumerate(group):
            local = idx_k - offsets[si]
            in_stage = (local >= 0) & (local < ns_list[si])
            safe = jnp.clip(local, 0, ns_list[si] - 1)
            rows = jnp.take_along_axis(stage, safe[..., None], axis=1)
            out = jnp.where(in_stage[..., None], rows, out)
        gathered.append(out)
    return score_k, idx_k, gathered

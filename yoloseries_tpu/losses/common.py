"""Shared loss primitives: stable BCE-with-logits (pos_weight), focal factor,
smooth one-hot — jnp equivalents of the torch pieces used across the
reference's loss modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bce_with_logits", "focal_loss_factor", "smooth_bce_targets"]


def bce_with_logits(logits, targets, pos_weight=1.0):
    """Elementwise binary cross-entropy on logits.

    Matches torch.nn.BCEWithLogitsLoss(pos_weight=w, reduction='none'):
    ``w * t * softplus(-x) + (1 - t) * softplus(x)``.
    """
    return pos_weight * targets * jax.nn.softplus(-logits) + (
        1.0 - targets
    ) * jax.nn.softplus(logits)


def focal_loss_factor(logits, targets, gamma=1.5, alpha=0.25):
    """Focal modulation factor (loss/yolov5_loss.py:216-235): down-weights
    easy examples, ``alpha`` balances positive/negative terms."""
    prob = jax.nn.sigmoid(logits)
    acc = targets * prob + (1.0 - targets) * (1.0 - prob)
    gamma_factor = (1.0 - acc) ** gamma
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return gamma_factor * alpha_factor


def smooth_bce_targets(eps: float = 0.0):
    """Label-smoothing targets for BCE (loss/yolov7_loss.py:11-13):
    returns (positive_target, negative_target)."""
    return 1.0 - 0.5 * eps, 0.5 * eps

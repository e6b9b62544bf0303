"""EMA of the full model state (params + batch_stats) as a pytree lerp.

Matches trainer/ema_model.py:7-28: decay = ratio * (1 - exp(-n / 2000)),
applied to every floating leaf of the state dict (the reference EMAs the
whole state_dict including BN buffers). The update count and tree live in
the TrainState, so the EMA is checkpointed and sharded with everything else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_decay_weight", "ema_update"]


def ema_decay_weight(update_num, decay_ratio: float = 0.9999):
    return decay_ratio * (1.0 - jnp.exp(-update_num / 2000.0))


def ema_update(ema_tree, new_tree, update_num, decay_ratio: float = 0.9999):
    """One EMA step: ema = d * ema + (1 - d) * new (in each float leaf)."""
    d = ema_decay_weight(update_num, decay_ratio)

    def lerp(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + p.astype(e.dtype) * (1.0 - d)
        return p

    return jax.tree.map(lerp, ema_tree, new_tree)

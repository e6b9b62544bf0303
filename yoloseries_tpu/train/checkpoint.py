"""Orbax checkpointing of the TrainState pytree.

Checkpoint contents mirror the reference's torch.save dict
(train_yolov5.py:603-629): model params + BN stats + optimizer state + EMA
state + ema update count + step + loss balances + the hyp dict — one
logical unit, restored piecewise-if-present like load_model
(train_yolov5.py:546-601).
"""

from __future__ import annotations

from pathlib import Path
import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _state_to_tree(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
        "ema_count": state.ema_count,
        "balances": state.balances,
    }


def save_checkpoint(ckpt_dir, state, step: int, hyp: dict | None = None,
                    keep: int = 3):
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    with ocp.CheckpointManager(ckpt_dir, options=options) as mgr:
        items = {"state": ocp.args.StandardSave(_state_to_tree(state))}
        if hyp is not None:
            items["hyp"] = ocp.args.JsonSave(
                {k: v for k, v in hyp.items() if _json_ok(v)}
            )
        mgr.save(step, args=ocp.args.Composite(**items))
        mgr.wait_until_finished()


def _json_ok(v) -> bool:
    return isinstance(v, (int, float, str, bool, type(None), list, tuple))


def latest_step(ckpt_dir) -> int | None:
    ckpt_dir = Path(ckpt_dir).absolute()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir, state, step: int | None = None):
    """Restore into an existing TrainState template (same treedef)."""
    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            return state, None
        template = jax.tree.map(lambda x: x, _state_to_tree(state))
        restored = mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(template))
        )
    tree = restored["state"]
    return state.replace(**tree), step

"""Model summary: parameter counts and FLOPs (utils/model_utils.py:40-63
rebuild — the reference shells into thop; here XLA's own cost analysis).
Also the config pretty-printer (utils/logger.py:11-49 equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["summarize_model", "format_hyp_table"]


def summarize_model(model, input_shape=(1, 640, 640, 3)) -> dict:
    """Returns {'params': N, 'gflops': fwd GFLOPs, 'param_bytes': bytes}.

    FLOPs come from XLA's cost analysis of the compiled forward pass —
    measured on the lowered HLO, not estimated per-layer.
    """
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros(input_shape, jnp.float32), train=False
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    n_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(variables["params"])
    )

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    lowered = fwd.lower(variables, jnp.zeros(input_shape, jnp.float32))
    try:
        cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops = 0.0
    return {
        "params": int(n_params),
        "param_bytes": int(n_bytes),
        "gflops": flops / 1e9,
    }


def format_hyp_table(hyp: dict, title: str = "config") -> str:
    """Box-drawing table of hyperparameters (utils/logger.py assemble_hyp)."""
    items = [(str(k), str(v)) for k, v in sorted(hyp.items())]
    if not items:
        return f"{title}: (empty)"
    kw = max(max(len(k) for k, _ in items), len(title))
    vw = max(min(max(len(v) for _, v in items), 60), 5)
    sep = "+" + "-" * (kw + 2) + "+" + "-" * (vw + 2) + "+"
    lines = [sep, f"| {title:<{kw}} | {'value':<{vw}} |", sep]
    for k, v in items:
        lines.append(f"| {k:<{kw}} | {v[:vw]:<{vw}} |")
    lines.append(sep)
    return "\n".join(lines)

"""Auxiliary crop classifier (classfier/classifier.py:10-74 rebuild).

The reference trains a torchvision resnet101 with a replacement fc layer on
detection crops, intended to re-score detector outputs (its trainer hook is
a `pass` stub, train_yolov5.py:492-494). Here: the same ResNet bottleneck
backbone used by RetinaNet + global average pooling + a Dense head, with a
`train_classifier` convenience loop over (crop, label) batches.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .retinanet import ResNetBackbone

__all__ = ["CropClassifier", "train_classifier"]


class CropClassifier(nn.Module):
    num_class: int
    resnet_layers: tuple = (3, 4, 23, 3)  # resnet101 (reference default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, _, c5 = ResNetBackbone(
            layers=self.resnet_layers, dtype=self.dtype, name="backbone"
        )(x, train)
        pooled = jnp.mean(c5, axis=(1, 2))
        return nn.Dense(self.num_class, dtype=self.dtype, name="fc")(pooled)


def train_classifier(model, batches, rng, input_shape, lr=1e-3, log_fn=print):
    """Minimal supervised loop: batches yield (images (B,H,W,3) float,
    labels (B,) int). Returns final variables."""
    variables = model.init(rng, jnp.zeros(input_shape), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, labels):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, imgs, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return loss, (mutated["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, acc

    for i, (imgs, labels) in enumerate(batches):
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state,
            jnp.asarray(imgs, jnp.float32), jnp.asarray(labels),
        )
        if i % 10 == 0:
            log_fn(f"classifier step {i}: loss {float(loss):.4f} acc {float(acc):.3f}")
    return {"params": params, "batch_stats": batch_stats}

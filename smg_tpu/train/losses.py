"""Training losses: weighted 2D cross-entropy and the reference Huber.

Parity targets:
- reactive: 3-class CE with class 2 ('no loss') weighted 0
  (reference trainer.py:34-60 via utils.CrossEntropyLoss2d, utils.py:306-313
  = NLLLoss(log_softmax)).
- reinforcement: the reference's hand-rolled smooth-L1 on the scalar Q
  (trainer.py:344-380): 0.5 d^2 for |d| < 1 else |d| - 0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Tuple, not jnp.array: a module-level device array would initialize the
# jax backend at import time, defeating the CLI's --cpu platform override
# (and grabbing the exclusive TPU chip before main() runs).
REACTIVE_CLASS_WEIGHTS = (1.0, 1.0, 0.0)


def reactive_ce(logits: jax.Array, label: jax.Array) -> jax.Array:
    """Weighted CE. logits (..., 3), integer label (...,) -> loss (...,).

    Equivalent to NLLLoss2d(weight=[1,1,0]) on log_softmax for the 1x1
    spatial map the reference feeds it (trainer.py:296-328).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, label[..., None], axis=-1)[..., 0]
    w = jnp.asarray(REACTIVE_CLASS_WEIGHTS)[label]
    return -w * picked


def huber_q(q: jax.Array, label: jax.Array) -> jax.Array:
    """Reference smooth-L1 (trainer.py:345-348): elementwise."""
    d = jnp.abs(q - label)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

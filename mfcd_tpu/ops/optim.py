"""Adam with coupled weight decay — exact torch.optim.Adam semantics.

The reference uses ``torch.optim.Adam(lr, weight_decay)`` (reference
``structure.py:364``), i.e. *coupled* L2: ``g <- g + wd * p`` before the
moment updates (classic Adam, NOT AdamW), with defaults beta=(0.9, 0.999),
eps=1e-8 applied as ``m_hat / (sqrt(v_hat) + eps)``.  The update is written
out explicitly (rather than via optax constructors) so ``lr`` and ``wd``
can be *traced* values — the prerequisite for vmapping one compiled train
step across a batch of hyperparameter configurations.

Note the update is dense: weight decay shrinks even rows untouched by the
batch, exactly as torch's dense Adam does (see SURVEY §3.2).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any        # first-moment pytree
    nu: Any        # second-moment pytree
    step: jax.Array  # int32 step counter


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr,
    weight_decay,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One torch-Adam step; returns (new_params, new_state)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    def leaf(p, g, m, v):
        g = g + weight_decay * p          # coupled L2
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        m_hat = m / bc1
        v_hat = v / bc2
        p = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return p, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    out = [leaf(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, step=step)

"""AltSVM pairwise predictor — alternating SVM on comparison data.

Capability match for the Draft prototype ``AltSVMPairwisePredictor``
(``Draft/Week_1.ipynb`` cell 4).  The draft sketched the alternating
structure (rebuild factors from dual variables + stochastic per-comparison
delta updates) but omitted the SVM ingredients — the hinge loss, the
lambda-scaled primal-dual relation, and the box constraint on the duals —
without which the iteration diverges.  This module implements the full
alternating-SVM scheme (AltSVM as in Park et al., ICML 2015, "Preference
Completion"):

    min_(U,V)  lambda/2 (||U||^2 + ||V||^2)
             + sum_t max(0, 1 - p_t * u_{i_t} . (v_{j_t} - v_{k_t}))

alternating dual coordinate descent over the user phase (V fixed: each
user's subproblem is a linear SVM with features p (v_j - v_k)) and the item
phase (U fixed), with

    u_i = (1/lambda) sum_{t: user=i} alpha_t p_t (v_{j_t} - v_{k_t}),
    alpha_t in [0, C].

Each phase restarts from the zero primal-dual origin (u_i = 0 <=> alpha = 0
is the consistent starting point of a fresh SVM solve) and runs DCD sweeps;
the inherently sequential coordinate updates are a ``lax.scan`` over a
random visiting order.  ``rebuild_users`` / ``rebuild_items`` expose the
segment-sum primal-from-dual reconstruction for warm-start variants.

Prediction: score(u, j, k) = U[u] . (V[j] - V[k]); the label is the sign.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AltSVMState(NamedTuple):
    user_features: jax.Array    # [n_users, f]
    movie_features: jax.Array   # [n_movies, f]
    alpha: jax.Array            # [T] duals of the user phase, in [0, C]
    beta: jax.Array             # [T] duals of the item phase, in [0, C]


def init_altsvm(key, n_users: int, n_movies: int, num_features: int = 20,
                num_comparisons: int = 0) -> AltSVMState:
    ku, kv = jax.random.split(key)
    return AltSVMState(
        user_features=jax.random.normal(ku, (n_users, num_features)),
        movie_features=jax.random.normal(kv, (n_movies, num_features)),
        alpha=jnp.zeros((num_comparisons,)),
        beta=jnp.zeros((num_comparisons,)),
    )


def predict(state: AltSVMState, users, movie_j, movie_k) -> jax.Array:
    u = state.user_features[users]
    return jnp.sum(u * (state.movie_features[movie_j]
                        - state.movie_features[movie_k]), axis=1)


def _picks(key, t, sweeps):
    """Random visiting order: ``sweeps`` whole-dataset permutations."""
    perms = jax.vmap(lambda k: jax.random.permutation(k, t))(
        jax.random.split(key, sweeps))
    return perms.reshape(-1)


def rebuild_users(state, users, movie_j, movie_k, prefs, lam):
    """u_i = (1/lambda) sum alpha_t p_t (v_j - v_k)  (primal from duals)."""
    dv = state.movie_features[movie_j] - state.movie_features[movie_k]
    w = (state.alpha * prefs)[:, None] * dv / lam
    n_users = state.user_features.shape[0]
    return state._replace(
        user_features=jax.ops.segment_sum(w, users, num_segments=n_users)
    )


def rebuild_items(state, users, movie_j, movie_k, prefs, lam):
    """v_j (+) / v_k (-) rebuilt from the item-phase duals."""
    w = (state.beta * prefs)[:, None] * state.user_features[users] / lam
    n_movies = state.movie_features.shape[0]
    pos = jax.ops.segment_sum(w, movie_j, num_segments=n_movies)
    neg = jax.ops.segment_sum(w, movie_k, num_segments=n_movies)
    return state._replace(movie_features=pos - neg)


def _dcd_users(state, key, users, movie_j, movie_k, prefs, lam, c, sweeps):
    """Dual coordinate descent on the user phase (V fixed)."""
    t = prefs.shape[0]
    picks = _picks(key, t, sweeps)

    def body(carry, idx):
        u, alpha = carry
        i = users[idx]
        pref = prefs[idx].astype(u.dtype)
        x = pref * (state.movie_features[movie_j[idx]]
                    - state.movie_features[movie_k[idx]])
        q = jnp.dot(x, x) / lam
        grad = jnp.dot(u[i], x) - 1.0
        new_a = jnp.clip(alpha[idx] - grad / jnp.maximum(q, 1e-12), 0.0, c)
        delta = new_a - alpha[idx]
        alpha = alpha.at[idx].set(new_a)
        u = u.at[i].add(delta * x / lam)
        return (u, alpha), None

    (u, alpha), _ = jax.lax.scan(
        body, (state.user_features, state.alpha), picks)
    return state._replace(user_features=u, alpha=alpha)


def _dcd_items(state, key, users, movie_j, movie_k, prefs, lam, c, sweeps):
    """Dual coordinate descent on the item phase (U fixed)."""
    t = prefs.shape[0]
    picks = _picks(key, t, sweeps)

    def body(carry, idx):
        v, beta = carry
        i, j, k = users[idx], movie_j[idx], movie_k[idx]
        pref = prefs[idx].astype(v.dtype)
        u_vec = state.user_features[i]
        # The "feature" of (v_j, v_k) is (+p u, -p u), so the diagonal
        # curvature is 2 ||u||^2 / lambda.
        margin = pref * jnp.dot(u_vec, v[j] - v[k])
        q = 2.0 * jnp.dot(u_vec, u_vec) / lam
        grad = margin - 1.0
        new_b = jnp.clip(beta[idx] - grad / jnp.maximum(q, 1e-12), 0.0, c)
        delta = new_b - beta[idx]
        beta = beta.at[idx].set(new_b)
        v = v.at[j].add(delta * pref * u_vec / lam)
        v = v.at[k].add(-delta * pref * u_vec / lam)
        return (v, beta), None

    (v, beta), _ = jax.lax.scan(
        body, (state.movie_features, state.beta), picks)
    return state._replace(movie_features=v, beta=beta)


@partial(jax.jit,
         static_argnames=("num_epochs", "sweeps_per_phase"))
def train_altsvm(
    state: AltSVMState, key,
    users, movie_j, movie_k, prefs,
    num_epochs: int = 10, lambda_reg: float = 0.1, C: float = 1.0,
    sweeps_per_phase: int = 3,
) -> AltSVMState:
    """Alternating SVM training.

    Per epoch: solve the item-phase SVM (V given U) by dual coordinate
    descent from the zero-dual origin, then the user-phase SVM (U given V)
    — the draft's alternating structure with the convergent SVM math.  The
    very first item phase uses the random U init, exactly like the draft.
    """

    def epoch(state, ekey):
        k1, k2 = jax.random.split(ekey)
        # Item phase: fresh SVM in V given U — duals and V start at 0
        # (the consistent primal-dual origin), then DCD sweeps build V up.
        state = state._replace(
            beta=jnp.zeros_like(state.beta),
            movie_features=jnp.zeros_like(state.movie_features),
        )
        state = _dcd_items(state, k1, users, movie_j, movie_k, prefs,
                           lambda_reg, C, sweeps_per_phase)
        # User phase: fresh SVM in U given V.
        state = state._replace(
            alpha=jnp.zeros_like(state.alpha),
            user_features=jnp.zeros_like(state.user_features),
        )
        state = _dcd_users(state, k2, users, movie_j, movie_k, prefs,
                           lambda_reg, C, sweeps_per_phase)
        return state, None

    keys = jax.random.split(key, num_epochs)
    state, _ = jax.lax.scan(epoch, state, keys)
    return state


def pairwise_accuracy(state: AltSVMState, users, movie_j, movie_k, prefs):
    pred = predict(state, users, movie_j, movie_k)
    return jnp.mean(((pred > 0) == (prefs > 0)).astype(jnp.float32))

"""Jittable clustering primitives (KMeans, GMM) + the generators using them.

The reference calls sklearn's ``KMeans`` (``generation_data.py:415,235``) and
``GaussianMixture`` (``generation_data.py:705-709``) on the host.  Those are
re-designed here as fixed-iteration, static-shape Lloyd / EM loops built on
``lax.fori_loop`` so whole runs stay on device and vmap across repetitions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mfcd_tpu.genx.generators import generate_base


def kmeans_plusplus_init(key: jax.Array, points: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding: first center uniform, then prob proportional to
    squared distance to the nearest chosen center."""
    npts = points.shape[0]
    k0, kseq = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, npts)
    centers0 = jnp.zeros((k, points.shape[1]), points.dtype)
    centers0 = centers0.at[0].set(points[first])
    d2_0 = jnp.sum((points - points[first]) ** 2, axis=-1)

    def body(i, carry):
        centers, d2 = carry
        kk = jax.random.fold_in(kseq, i)
        # Sample next center index with probability proportional to d2.
        logits = jnp.log(jnp.maximum(d2, 1e-30))
        idx = jax.random.categorical(kk, logits)
        c = points[idx]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((points - c) ** 2, axis=-1))
        return centers, d2

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, d2_0))
    return centers


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    key: jax.Array, points: jax.Array, k: int, iters: int = 25
) -> tuple[jax.Array, jax.Array]:
    """Lloyd's algorithm with k-means++ init.

    Returns ``(labels [N], centers [k, D])``.  Fixed iteration count instead
    of sklearn's tolerance check — convergence at these sizes is fast and a
    static loop keeps the program shape-stable under jit/vmap.
    """
    centers = kmeans_plusplus_init(key, points, k)

    def assign(centers):
        # [N, k] squared distances via (x - c)^2 = x^2 - 2 x.c + c^2
        x2 = jnp.sum(points**2, axis=-1, keepdims=True)
        c2 = jnp.sum(centers**2, axis=-1)[None, :]
        d2 = x2 - 2.0 * points @ centers.T + c2
        return jnp.argmin(d2, axis=-1)

    def body(_, centers):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, k, dtype=points.dtype)  # [N, k]
        counts = jnp.sum(onehot, axis=0)                        # [k]
        sums = onehot.T @ points                                # [k, D]
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous center.
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    return assign(centers), centers


@partial(jax.jit, static_argnames=("k", "iters"))
def gmm_fit_predict(
    key: jax.Array, points: jax.Array, k: int, iters: int = 20
) -> tuple[jax.Array, jax.Array]:
    """Full-covariance Gaussian mixture EM (KMeans init).

    Returns ``(labels [N], means [k, D])`` — the two things the reference
    consumes from sklearn's ``GaussianMixture`` (``generation_data.py:708-713``).
    """
    n, d = points.shape
    labels0, means0 = kmeans(key, points, k)
    onehot = jax.nn.one_hot(labels0, k, dtype=points.dtype)
    eye = jnp.eye(d, dtype=points.dtype)

    def m_step(resp):
        nk = jnp.sum(resp, axis=0) + 1e-10                       # [k]
        means = (resp.T @ points) / nk[:, None]                  # [k, D]
        diff = points[None, :, :] - means[:, None, :]            # [k, N, D]
        covs = jnp.einsum("kn,knd,kne->kde", resp.T, diff, diff)
        covs = covs / nk[:, None, None] + 1e-6 * eye[None]
        return nk / n, means, covs

    def log_prob(weights, means, covs):
        chol = jnp.linalg.cholesky(covs)                          # [k, D, D]
        diff = points[None, :, :] - means[:, None, :]             # [k, N, D]
        sol = jax.vmap(
            lambda L, b: jax.scipy.linalg.solve_triangular(L, b.T, lower=True)
        )(chol, diff)                                             # [k, D, N]
        maha = jnp.sum(sol**2, axis=1)                            # [k, N]
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
        )                                                         # [k]
        logp = (
            -0.5 * (maha + d * jnp.log(2.0 * jnp.pi) + logdet[:, None])
            + jnp.log(weights + 1e-30)[:, None]
        )
        return logp.T                                             # [N, k]

    weights, means, covs = m_step(onehot)

    def body(_, carry):
        weights, means, covs = carry
        logp = log_prob(weights, means, covs)
        resp = jax.nn.softmax(logp, axis=-1)
        return m_step(resp)

    weights, means, covs = jax.lax.fori_loop(0, iters, body, (weights, means, covs))
    labels = jnp.argmax(log_prob(weights, means, covs), axis=-1)
    return labels, means


def generate_clustered(
    key: jax.Array, n: int, m: int, d: int,
    n_clusters: int = 5, scale: float = 1.0, shift_strength: float = 0.5,
) -> jax.Array:
    """``generation="clustered"`` (reference ``generation_data.py:394-434``):
    base X, KMeans on item columns, each item column soft-shifted toward its
    cluster's mean column by ``shift_strength``."""
    kx, kc = jax.random.split(key)
    x = generate_base(kx, n, m, d)
    items = x.T                                       # [m, n] item vectors
    labels, _ = kmeans(kc, items, n_clusters)
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)   # [m, k]
    counts = jnp.sum(onehot, axis=0)                             # [k]
    cluster_mean_cols = (x @ onehot) / jnp.maximum(counts, 1.0)[None, :]  # [n, k]
    shifted = (1.0 - shift_strength) * x + shift_strength * (
        cluster_mean_cols @ onehot.T
    )
    return shifted * scale


def generate_gmm(
    key: jax.Array, n: int, m: int, d: int, num_clusters: int = 5
) -> tuple[jax.Array, jax.Array]:
    """``generation="gmm"`` (reference ``generation_data.py:686-715``).

    Reference quirk preserved: the same GMM object is re-fit on item points
    after predicting user labels, so *both* U and V use the item-fit means —
    user embeddings pair user-fit labels with item-fit means
    (``generation_data.py:705-713``).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    user_pts = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    item_pts = jax.random.normal(k2, (m, d), dtype=jnp.float32)
    user_labels, _ = gmm_fit_predict(k3, user_pts, num_clusters)
    item_labels, item_means = gmm_fit_predict(k4, item_pts, num_clusters)
    return item_means[user_labels], item_means[item_labels]

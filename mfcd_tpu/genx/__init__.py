"""Ground-truth matrix generation — ``generate_x`` dispatch.

TPU-native equivalent of ``generate_X`` (reference ``structure.py:590-663``):
a pure function of a PRNG key dispatching over the 11 generation keywords.
Pair-returning modes are combined as ``U @ V.T`` exactly as the reference
does (``structure.py:618-655``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mfcd_tpu.genx.generators import (  # noqa: F401
    generate_base,
    generate_correlated,
    generate_hierarchical,
    generate_low_rank,
    generate_structured,
    generate_svd,
    generate_temporal,
    haar_frame,
)
from mfcd_tpu.genx.clusters import (  # noqa: F401
    generate_clustered,
    generate_gmm,
    gmm_fit_predict,
    kmeans,
)
from mfcd_tpu.genx.graphs import (  # noqa: F401
    generate_graph,
    generate_social,
    watts_strogatz_adjacency,
)

GENERATION_MODES = (
    "base", "low_rank", "clustered", "structured", "svd", "correlated",
    "graph", "social", "temporal", "hierarchical", "gmm",
)

# Modes returning X directly vs (U, V) pairs (reference structure.py:609-659).
_DIRECT = {"base", "low_rank", "clustered"}

_PAIR_FNS = {
    "structured": generate_structured,
    "svd": generate_svd,
    "correlated": generate_correlated,
    "graph": generate_graph,
    "social": generate_social,
    "temporal": generate_temporal,
    "hierarchical": generate_hierarchical,
    "gmm": generate_gmm,
}


@partial(jax.jit, static_argnames=("n", "m", "d", "generation"))
def generate_x(
    key: jax.Array, n: int, m: int, d: int, generation: str = "base", **kwargs
) -> jax.Array:
    """Generate the (n, m) ground-truth preference matrix X*.

    Drop-in capability match for ``generate_X`` (reference
    ``structure.py:590-663``), with the device string replaced by a PRNG key.
    """
    if generation == "base":
        return generate_base(key, n, m, d)
    if generation == "low_rank":
        return generate_low_rank(key, n, m, d, rank=kwargs.get("rank", d))
    if generation == "clustered":
        return generate_clustered(key, n, m, d)
    if generation in _PAIR_FNS:
        u, v = _PAIR_FNS[generation](key, n, m, d, **kwargs)
        return u @ v.T
    raise ValueError(f"Unknown generation method: {generation}")

"""user_similarity fills its FULL budget at production scale (VERDICT r3 item 4).

The reference sampler (``generation_data.py:251-295``) caps at 10k attempts
(<= 1 triplet each), so at the canonical n=m=1000, p=0.2 budget of 100k it
returns at most 10% of target with a warning.  The round-4 cascade sampler
gives every attempt up to num_neighbors (<=20) chances at a fresh triplet
(the reference's own per-attempt neighbor scan), so per-attempt success
stays near 1 until the support is nearly exhausted (the fallback pool alone
spans ~n*tk*(tk-1) ~ 824k) — with the 3x-attempts plan (early-exit makes
the margin free when success is high) the sampler must deliver
``count == budget`` exactly.
"""

import jax
import pytest

from mfcd_tpu.genx.generators import generate_base
from mfcd_tpu.sampling import sample_triplets
from mfcd_tpu.sampling.strategies import plan_overdraw


def test_overdraw_plan_is_3x_attempts():
    assert plan_overdraw("user_similarity", 100_000, 1000, 1000) == 300_000


@pytest.mark.slow
def test_full_budget_at_production_scale():
    """count == 100,000 exactly at the canonical reference config."""
    n = m = 1000
    budget = int(n * m * 0.2 / 2)  # p=0.2 (structure.py:356)
    kx, ks = jax.random.split(jax.random.key(0))
    x = generate_base(kx, n, m, 2)
    ts = sample_triplets(ks, x, budget, strategy="user_similarity")
    assert int(ts.count) == budget
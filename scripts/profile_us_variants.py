"""Second-stage user_similarity variants A/B (round 5, VERDICT r4 item 4).

After the eq-tensor membership swap the canonical config runs 1.456 s/run
(cand ~0.67 s, cascade ~0.72 s, train+metrics ~0.07 s).  This measures the
remaining candidate-stage levers before committing to a redesign:

  base        current: lax.map over 20 ranks, eq masks + 2 categoricals
  masks_only  eq masks + any() reductions, no sampling — isolates the
              RNG (threefry) + gumbel/categorical share
  cheap_rng   one uniform int per row via masked-count + cumsum-rank
              select instead of tk gumbels (30x fewer random bits;
              CHANGES the RNG stream -> would need P12 re-cert)
  vec4        rank axis in blocks of 4 inside one batched program
              (fewer, larger dispatches; same math as base)
  cascade_n   cascade_resolve with the pass count reported

Timings force execution with device_get (block_until_ready is a no-op on
axon).  Usage: flock .tpu_session.lock python scripts/profile_us_variants.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import mfcd_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.sampling import strategies as st


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, results, reps=3):
    fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.device_get(out)
    dt = (time.time() - t0) / reps
    results[name] = round(dt, 4)
    log(f"{name:12s} {dt:8.3f}s")
    return out


def main():
    n = m = 1000
    num_triplets = 100_000
    a = st.plan_overdraw("user_similarity", num_triplets, n, m)

    key = jax.random.key(7)
    kx, ks = jax.random.split(key)
    x = jax.random.normal(kx, (n, m), jnp.float32)
    nb = 20
    tk = 30

    @jax.jit
    def preamble(x):
        norms = jnp.linalg.norm(x, axis=1, keepdims=True)
        xn = x / jnp.maximum(norms, 1e-12)
        sims = xn @ xn.T - 2.0 * jnp.eye(n)
        _, neighbors = jax.lax.top_k(sims, nb)
        _, topk_idx = jax.lax.top_k(x, tk)
        return neighbors, topk_idx

    neighbors, topk_idx = jax.device_get(preamble(x))
    neighbors = jnp.asarray(neighbors)
    topk_idx = jnp.asarray(topk_idx)

    ku, kc = jax.random.split(ks)
    u = jax.random.randint(ku, (a,), 0, n)
    rank_keys = jax.random.split(kc, nb)
    ranks = jnp.arange(nb, dtype=jnp.int32)

    def masks(r):
        tk_u = topk_idx[u]
        v_c = neighbors[u, r]
        tk_v = topk_idx[v_c]
        eq = tk_u[:, :, None] == tk_v[:, None, :]
        return tk_u, tk_v, ~jnp.any(eq, axis=2), ~jnp.any(eq, axis=1)

    def finish_base(kk_r, tk_u, tk_v, only_u, only_v):
        kki, kkj, kkf = jax.random.split(kk_r, 3)
        have = jnp.any(only_u, axis=1) & jnp.any(only_v, axis=1)
        pi = jax.random.categorical(
            kki, jnp.where(only_u, 0.0, -1e30), axis=-1).astype(jnp.int32)
        pj = jax.random.categorical(
            kkj, jnp.where(only_v, 0.0, -1e30), axis=-1).astype(jnp.int32)
        i_diff = jnp.take_along_axis(tk_u, pi[:, None], axis=1)[:, 0]
        j_diff = jnp.take_along_axis(tk_v, pj[:, None], axis=1)[:, 0]
        pa, pb = st._distinct_pos(kkf, u.shape[0], tk)
        i_fb = jnp.take_along_axis(tk_u, pa[:, None], axis=1)[:, 0]
        j_fb = jnp.take_along_axis(tk_u, pb[:, None], axis=1)[:, 0]
        return (jnp.where(have, i_diff, i_fb),
                jnp.where(have, j_diff, j_fb))

    def rank_base(args):
        kk_r, r = args
        return finish_base(kk_r, *masks(r))

    def rank_masks_only(args):
        _, r = args
        tk_u, tk_v, only_u, only_v = masks(r)
        return (jnp.argmax(only_u, axis=1), jnp.argmax(only_v, axis=1))

    def uniform_pos_cheap(kk, mask):
        # One uniform per row: draw t ~ U[0, count) and select the t-th
        # set position via an exclusive cumsum rank match.
        cnt = jnp.sum(mask, axis=1)
        t = (jax.random.uniform(kk, cnt.shape)
             * jnp.maximum(cnt, 1).astype(jnp.float32)).astype(jnp.int32)
        csum = jnp.cumsum(mask.astype(jnp.int32), axis=1) - mask
        hit = mask & (csum == t[:, None])
        return jnp.argmax(hit, axis=1).astype(jnp.int32)

    def rank_cheap(args):
        kk_r, r = args
        tk_u, tk_v, only_u, only_v = masks(r)
        kki, kkj, kkf = jax.random.split(kk_r, 3)
        have = jnp.any(only_u, axis=1) & jnp.any(only_v, axis=1)
        pi = uniform_pos_cheap(kki, only_u)
        pj = uniform_pos_cheap(kkj, only_v)
        i_diff = jnp.take_along_axis(tk_u, pi[:, None], axis=1)[:, 0]
        j_diff = jnp.take_along_axis(tk_v, pj[:, None], axis=1)[:, 0]
        pa, pb = st._distinct_pos(kkf, u.shape[0], tk)
        i_fb = jnp.take_along_axis(tk_u, pa[:, None], axis=1)[:, 0]
        j_fb = jnp.take_along_axis(tk_u, pb[:, None], axis=1)[:, 0]
        return (jnp.where(have, i_diff, i_fb),
                jnp.where(have, j_diff, j_fb))

    results = {}
    base = jax.jit(lambda: jax.lax.map(rank_base, (rank_keys, ranks)))
    ig, jg = timeit("base", base, results)

    timeit("masks_only", jax.jit(
        lambda: jax.lax.map(rank_masks_only, (rank_keys, ranks))), results)
    timeit("cheap_rng", jax.jit(
        lambda: jax.lax.map(rank_cheap, (rank_keys, ranks))), results)

    def vec4():
        def blk(args):
            kk4, r4 = args
            return jax.vmap(lambda kk, r: finish_base(kk, *masks(r)))(kk4, r4)
        out = jax.lax.map(
            blk, (rank_keys.reshape(5, 4), ranks.reshape(5, 4)))
        return jax.tree.map(lambda t: t.reshape(nb, -1), out)

    timeit("vec4", jax.jit(vec4), results)

    cascade = jax.jit(
        lambda u_, i_, j_: st.cascade_resolve(u_, i_, j_, m))
    timeit("cascade", lambda: cascade(u, ig, jg), results)

    # Pass count: replicate the loop with a counter included in the carry.
    @jax.jit
    def cascade_passes(u_, i_, j_):
        wins = st.cascade_resolve(u_, i_, j_, m)
        return wins.sum()

    wins_sum = int(jax.device_get(cascade_passes(u, ig, jg)))
    log(f"cascade wins: {wins_sum} of {a} attempts "
        f"({100.0 * wins_sum / a:.1f}% resolved)")

    payload = {
        "config": {"n": n, "m": m, "num_triplets": num_triplets,
                   "attempts": int(a)},
        "seconds": results,
        "cascade_resolved_attempts": wins_sum,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(payload))
    outp = "/root/repo/docs/device_r5/us_variants.json"
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()

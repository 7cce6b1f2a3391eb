"""On-chip cost split of the user_similarity sample path (VERDICT r4 item 4).

The cascade sampler costs 4.4 s/run steady on-chip at the canonical config
(round 5; was 1.53 s/run in round 4 with [rows, m] set-difference masks —
the round-5 top-set-space rework cut CPU bool work ~30x but replaced
regular VPU mask math with per-element 2D gathers, which TPUs execute on
the slow scalar gather path).  Before redesigning, split the program:

  preamble   sims matmul + two top_k + scatter of the [n, m] top-mask
  cand(gather) per-rank candidates via topk_mask membership GATHERS
  cand(cmp)    same candidates via a tk x tk equality-compare (regular
               VPU work, no gathers) — must produce IDENTICAL masks
  cascade    cascade_resolve (iterated scatter-min to the fixpoint)
  full       propose_user_similarity end to end

Timings force execution with device_get (block_until_ready is a no-op on
the axon platform — measured 0.000 s vs 6.997 s on a ~7 s program).

Usage:  flock .tpu_session.lock python scripts/profile_user_similarity_split.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import mfcd_tpu  # noqa: F401  (compile cache + matmul precision)
import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.sampling import strategies as st


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, results, reps=3):
    fn()  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.device_get(out)
    dt = (time.time() - t0) / reps
    results[name] = round(dt, 4)
    log(f"{name:16s} {dt:8.3f}s")
    return out


def main():
    n = m = 1000
    num_triplets = 100_000
    a = st.plan_overdraw("user_similarity", num_triplets, n, m)
    log(f"attempts={a}")

    key = jax.random.key(7)
    kx, ks = jax.random.split(key)
    x = jax.random.normal(kx, (n, m), jnp.float32)

    num_neighbors = min(20, max(3, num_triplets // n))
    top_k_items = max(3, min(m // 10, 10 + num_triplets // (5 * n)))

    @jax.jit
    def preamble(x):
        norms = jnp.linalg.norm(x, axis=1, keepdims=True)
        xn = x / jnp.maximum(norms, 1e-12)
        sims = xn @ xn.T - 2.0 * jnp.eye(n)
        _, neighbors = jax.lax.top_k(sims, num_neighbors)
        _, topk_idx = jax.lax.top_k(x, top_k_items)
        topk_mask = jnp.zeros((n, m), bool).at[
            jnp.arange(n)[:, None], topk_idx].set(True)
        return neighbors, topk_idx, topk_mask

    results = {}
    neighbors, topk_idx, topk_mask = timeit(
        "preamble", lambda: preamble(x), results)

    ku, kc = jax.random.split(ks)
    u = jax.random.randint(ku, (a,), 0, n)
    rank_keys = jax.random.split(kc, num_neighbors)
    ranks = jnp.arange(num_neighbors, dtype=jnp.int32)

    def rank_gather(kk_r, r):
        kki, kkj, kkf = jax.random.split(kk_r, 3)
        tk_u = topk_idx[u]
        v_c = neighbors[u, r]
        tk_v = topk_idx[v_c]
        only_u = ~topk_mask[v_c[:, None], tk_u]
        only_v = ~topk_mask[u[:, None], tk_v]
        return _finish(kki, kkj, kkf, tk_u, tk_v, only_u, only_v)

    def rank_cmp(kk_r, r):
        kki, kkj, kkf = jax.random.split(kk_r, 3)
        tk_u = topk_idx[u]
        v_c = neighbors[u, r]
        tk_v = topk_idx[v_c]
        # membership via equality-compare: tk_u[c, t] in top(v_c) iff it
        # equals SOME element of tk_v[c] — [chunk, tk, tk] regular compare
        # instead of per-element gathers from the [n, m] mask.
        only_u = ~jnp.any(tk_u[:, :, None] == tk_v[:, None, :], axis=2)
        only_v = ~jnp.any(tk_v[:, :, None] == tk_u[:, None, :], axis=2)
        return _finish(kki, kkj, kkf, tk_u, tk_v, only_u, only_v)

    def _finish(kki, kkj, kkf, tk_u, tk_v, only_u, only_v):
        have = jnp.any(only_u, axis=1) & jnp.any(only_v, axis=1)
        logits_u = jnp.where(only_u, 0.0, -1e30)
        logits_v = jnp.where(only_v, 0.0, -1e30)
        pi = jax.random.categorical(kki, logits_u, axis=-1).astype(jnp.int32)
        pj = jax.random.categorical(kkj, logits_v, axis=-1).astype(jnp.int32)
        i_diff = jnp.take_along_axis(tk_u, pi[:, None], axis=1)[:, 0]
        j_diff = jnp.take_along_axis(tk_v, pj[:, None], axis=1)[:, 0]
        pa, pb = st._distinct_pos(kkf, u.shape[0], top_k_items)
        i_fb = jnp.take_along_axis(tk_u, pa[:, None], axis=1)[:, 0]
        j_fb = jnp.take_along_axis(tk_u, pb[:, None], axis=1)[:, 0]
        return (jnp.where(have, i_diff, i_fb),
                jnp.where(have, j_diff, j_fb))

    cands_gather = jax.jit(lambda: jax.lax.map(
        lambda args: rank_gather(*args), (rank_keys, ranks)))
    cands_cmp = jax.jit(lambda: jax.lax.map(
        lambda args: rank_cmp(*args), (rank_keys, ranks)))

    ig, jg = timeit("cand(gather)", cands_gather, results)
    ic, jc = timeit("cand(cmp)", cands_cmp, results)
    same = bool(jnp.all(ig == ic) & jnp.all(jg == jc))
    log(f"cand equality (gather vs cmp): {same}")

    cascade = jax.jit(
        lambda u_, i_, j_: st.cascade_resolve(u_, i_, j_, m))
    timeit("cascade", lambda: cascade(u, ig, jg), results)

    full = jax.jit(lambda k: st.propose_user_similarity(
        k, x, a, num_triplets))
    timeit("full", lambda: full(ks), results)

    payload = {
        "config": {"n": n, "m": m, "num_triplets": num_triplets,
                   "attempts": int(a), "num_neighbors": num_neighbors,
                   "top_k_items": top_k_items},
        "seconds": results,
        "cand_masks_identical": same,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(payload))
    outp = "/root/repo/docs/device_r5/user_similarity_split.json"
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()

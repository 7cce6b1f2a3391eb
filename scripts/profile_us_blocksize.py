"""Block-size sweep for the blocked user_similarity cascade (round 5).

The budget early-exit processes ceil(budget / blk) * blk attempts when
(as at the canonical config) ~every attempt resolves, so the block size
sets the overshoot: blk=32768 -> 131,072 attempts for a 100k budget
(31% waste); blk=8192 -> 106,496 (6.5%).  Smaller blocks add while-loop
iterations (on-device, one dispatch total) and per-block fixpoint
passes; this measures where the trade bottoms out before pinning
``_US_BLOCK_ELEMS``.

Timings force execution with device_get (block_until_ready is a no-op
on axon).  Usage: flock .tpu_session.lock python scripts/profile_us_blocksize.py
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

from mfcd_tpu.sampling import strategies as st


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = m = 1000
    num_triplets = 100_000
    a = st.plan_overdraw("user_similarity", num_triplets, n, m)
    key = jax.random.key(7)
    kx, ks = jax.random.split(key)
    x = jax.random.normal(kx, (n, m), jnp.float32)

    results = {}
    tk = 30  # top_k_items at this config
    for blk in (32768, 16384, 8192, 4096):
        st._US_BLOCK_ELEMS = blk * tk * tk

        @jax.jit
        def full(x, ks):
            return st.propose_user_similarity(ks, x, a, num_triplets)

        out = full(x, ks)
        jax.device_get(out)  # compile + warm
        t0 = time.time()
        for _ in range(3):
            out = full(x, ks)
        cands, valid = out
        jax.device_get(valid)
        dt = (time.time() - t0) / 3
        nres = int(jax.device_get(valid.sum()))
        results[str(blk)] = {"s": round(dt, 4), "resolved": nres}
        log(f"blk={blk:6d}  {dt:8.3f}s  resolved={nres}")

    payload = {
        "config": {"n": n, "m": m, "num_triplets": num_triplets,
                   "attempts": a},
        "by_block_size": results,
        "device": str(jax.devices()[0].device_kind),
    }
    out_path = os.path.join("/root/repo/docs/device_r5",
                            "us_blocksize.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

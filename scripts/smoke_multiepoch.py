"""On-device smoke of the multi-epoch window kernel (compiled, not interpret).

Small-but-representative shapes through ``train_runs_pallas`` with
``MFCD_MULTIEPOCH=1``: checks the Mosaic kernel compiles, losses are finite
and decreasing, and the result is statistically sane vs the per-epoch path
on the SAME data (different permutation realizations — distribution-level
closeness only; the CI-grade comparison is scripts/validate_multiepoch.py).

Prints one JSON line.  Usage: python scripts/smoke_multiepoch.py
(``--interpret`` runs the kernels in interpret mode — CPU logic check).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("MFCD_MULTIEPOCH", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import mfcd_tpu  # noqa: F401  (cache init)
    from mfcd_tpu.cache import ensure_cache_healthy

    ensure_cache_healthy()

    from mfcd_tpu.models.mf import init_params
    from mfcd_tpu.data.btl import LabeledSplit
    from mfcd_tpu.train import pallas_trainer as PT

    n = m = 256
    d = 2
    rows, vrows, bs = 4096, 512, 64
    r = 4
    kx, k1, k2, k3, k4 = jax.random.split(jax.random.key(5), 5)
    x = jax.random.normal(kx, (n, m))

    def split(key, nrows, frac_valid=1.0):
        ku, ki, kj = jax.random.split(key, 3)
        u = jax.random.randint(ku, (r, nrows), 0, n)
        i = jax.random.randint(ki, (r, nrows), 0, m)
        j = jax.random.randint(kj, (r, nrows), 0, m)
        z = (x[u, i] > x[u, j]).astype(jnp.float32)
        count = jnp.full((r,), int(frac_valid * nrows), jnp.int32)
        valid = jnp.arange(nrows)[None, :] < count[:, None]
        return LabeledSplit(u, i, j, z, valid, count)

    params = jax.vmap(lambda k: init_params(k, n, m, d))(
        jax.random.split(k1, r))
    train = split(k2, rows, 0.9)
    val = split(k3, vrows)
    keys = jax.random.split(k4, r)
    lr = jnp.full((r,), 5e-2, jnp.float32)
    wd = jnp.full((r,), 1e-5, jnp.float32)

    out = {}
    for mode in ("1", "0"):
        os.environ["MFCD_MULTIEPOCH"] = mode
        t0 = time.time()
        p, tl, vl = PT.train_runs_pallas(
            params, train, val, keys, lr, wd,
            batch_size=bs, num_epochs=12, reshuffle_period=4,
            interpret=args.interpret)
        tl, vl = np.asarray(tl), np.asarray(vl)
        compile_s = time.time() - t0
        finite = bool(np.isfinite(tl).all() and np.isfinite(vl).all())
        decreasing = bool((tl[:, -1] < tl[:, 0]).all())
        out[f"mode{mode}"] = {
            "compile_s": round(compile_s, 1),
            "finite": finite,
            "train_decreased": decreasing,
            "tl_last": [round(float(v), 4) for v in tl[:, -1]],
            "vl_last": [round(float(v), 4) for v in vl[:, -1]],
        }

    gap = max(abs(a - b) for a, b in zip(out["mode1"]["tl_last"],
                                         out["mode0"]["tl_last"]))
    ok = (out["mode1"]["finite"] and out["mode1"]["train_decreased"]
          and gap < 0.05)
    print(json.dumps({"ok": ok, "tl_gap": round(gap, 4), **out}))


if __name__ == "__main__":
    main()

"""Microbenchmark: exact alternatives to the per-epoch permuted gather.

The epoch shuffle's packed-int32 gather (`tr_packed[rows_sel]`) runs at
~10 ns/element as a plain XLA 1D gather — 41% of the train bucket.  Every
variant here computes the SAME output (bit-exact, asserted) from the same
[R, S] int32 indices:

  v0 element — baseline vmapped 1D gather
  v1 row128  — two-level: row-gather [S] 128-wide tiles, one-hot col select
  v2 row16   — same with 16-wide tiles
  v3 mxu     — one-hot MXU gather, 4 x 8-bit bf16 planes (exact transport)

Run standalone (single TPU process).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import mfcd_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 8
S = 131_072
EPOCHS = 30


def force(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]
                                     .ravel()[:1]))


def run_epochs(gather_fn, packed, idx_all):
    """scan over EPOCHS of gather_fn(packed [R,S], idx [R,S]) -> [R,S]."""

    def step(acc, e):
        y = gather_fn(packed, (idx_all + e) % S)
        return acc ^ y[:, :1], None

    acc, _ = jax.lax.scan(step, packed[:, :1], jnp.arange(EPOCHS))
    return acc


def v0_element(packed, idx):
    return jax.vmap(lambda p, i: p[i])(packed, idx)


def _two_level(packed, idx, width: int):
    rows = S // width
    table = packed.reshape(R, rows, width)
    hi = idx // width
    lo = idx % width
    tiles = jnp.take_along_axis(
        table, hi[:, :, None], axis=1)            # [R, S, width]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
           == lo[:, :, None])
    return jnp.sum(jnp.where(sel, tiles, 0), axis=2)


v1_row128 = partial(_two_level, width=128)
v2_row16 = partial(_two_level, width=16)


def v3_mxu(packed, idx, block: int = 8192, rows: int = 1024):
    width = S // rows
    planes = jnp.stack(
        [((packed >> (8 * k)) & 0xFF) for k in range(4)], axis=1
    ).astype(jnp.bfloat16).reshape(R, 4, rows, width)  # [R, 4, rows, width]

    hi = (idx // width).reshape(R, S // block, block)
    lo = (idx % width).reshape(R, S // block, block)

    def per_run(planes_r, hi_r, lo_r):
        def blk(args):
            h, l = args
            oh = (jax.lax.broadcasted_iota(jnp.int32, (block, rows), 1)
                  == h[:, None]).astype(jnp.bfloat16)
            got = jax.lax.dot_general(
                oh, planes_r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block, 4, width]
            sel = (jax.lax.broadcasted_iota(jnp.int32, (block, 1, width), 2)
                   == l[:, None, None])
            vals = jnp.sum(jnp.where(sel, got, 0.0), axis=2)  # [block, 4]
            b = vals.astype(jnp.int32)
            return (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                    | (b[:, 3] << 24))

        return jax.lax.map(blk, (hi_r, lo_r)).reshape(S)

    return jax.vmap(per_run)(planes, hi, lo)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(
        k1, (R, S), jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
        jnp.int32)
    idx = jax.vmap(lambda k: jax.random.permutation(k, S))(
        jax.random.split(k2, R)).astype(jnp.int32)

    log(f"device: {jax.devices()[0]}")

    ref = np.asarray(jax.device_get(v0_element(packed, idx)))
    variants = [
        ("v0 element", v0_element),
        ("v1 row128", v1_row128),
        ("v2 row16", v2_row16),
        ("v3 mxu", v3_mxu),
    ]
    for name, fn in variants:
        got = np.asarray(jax.device_get(fn(packed, idx)))
        ok = np.array_equal(got, ref)
        jitted = jax.jit(partial(run_epochs, fn))
        force(jitted(packed, idx))
        ts = []
        for _ in range(3):
            t0 = time.time()
            force(jitted(packed, idx))
            ts.append(time.time() - t0)
        ms = min(ts) * 1000
        log(f"{name:12s} exact={ok}  {ms:8.1f} ms/{EPOCHS}ep-bucket  "
            f"{ms/EPOCHS/R:6.3f} ms/epoch-run  "
            f"{min(ts)*1e9/(EPOCHS*R*S):5.2f} ns/elem")


if __name__ == "__main__":
    main()

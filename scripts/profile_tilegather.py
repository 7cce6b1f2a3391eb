"""Microbenchmark: tile-granularity gathers + dense mixing primitives.

Determines whether XLA TPU gather cost is per-index or per-element, and
times the dense ops a layout-native tile shuffle would use (conditional
rolls, transposes, prefix rotation via doubled-array dynamic slices).
Everything operates on the bench shape: [R=8, S=131072] int32.
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


def bench(name, make_fn, *args):
    fn = jax.jit(make_fn)
    force(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    ms = min(ts) * 1000
    log(f"{name:28s} {ms:8.2f} ms/{EPOCHS}ep-bucket  "
        f"{ms/EPOCHS/R*1000:7.1f} us/epoch-run")


def scan_epochs(step, x):
    def body(acc, e):
        y = step(acc, e)
        return y, None
    acc, _ = jax.lax.scan(body, x, jnp.arange(EPOCHS))
    return acc


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (R, S), jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max, jnp.int32)

    log(f"device: {jax.devices()[0]}")

    # --- tile gathers at several widths -------------------------------
    for width in (512, 128, 16):
        tiles = S // width
        tb = x.reshape(R, tiles, width)
        perm = jax.vmap(lambda k: jax.random.permutation(k, tiles))(
            jax.random.split(key, R)).astype(jnp.int32)

        def step(acc, e, tb=tb, perm=perm, tiles=tiles):
            p = (perm + e) % tiles
            y = jax.vmap(lambda t, i: t[i])(tb, p)
            return y

        bench(f"tilegather w={width} ({tiles} idx)",
              partial(scan_epochs, step), tb)

    # --- per-tile lane rolls (7 conditional static rolls) -------------
    tb = x.reshape(R, 1024, 128)

    def lane_rolls(acc, e):
        amt = (jnp.arange(1024, dtype=jnp.int32) * 40503 + e) & 127
        y = acc
        for b in range(7):
            bit = ((amt >> b) & 1).astype(bool)[None, :, None]
            y = jnp.where(bit, jnp.roll(y, 1 << b, axis=2), y)
        return y

    bench("lane rolls x7 (per-tile amt)", partial(scan_epochs, lane_rolls), tb)

    # --- per-lane tile rolls (10 conditional static rolls) ------------
    def tile_rolls(acc, e):
        amt = (jnp.arange(128, dtype=jnp.int32) * 40503 + e) & 1023
        y = acc
        for b in range(10):
            bit = ((amt >> b) & 1).astype(bool)[None, None, :]
            y = jnp.where(bit, jnp.roll(y, 1 << b, axis=1), y)
        return y

    bench("tile rolls x10 (per-lane amt)",
          partial(scan_epochs, tile_rolls), tb)

    # --- transpose there-and-back -------------------------------------
    def transp(acc, e):
        y = jnp.swapaxes(acc, 1, 2) + e
        return jnp.swapaxes(y, 1, 2)

    bench("transpose x2", partial(scan_epochs, transp), tb)

    # --- prefix rotation mod count via doubled dynamic slices ---------
    count = jnp.full((R,), 100_000, jnp.int32)

    def prefix_rot(acc, e):
        def one(xr, cnt):
            rho = (e * 40503 + 12345) % cnt
            d = jnp.concatenate([xr, xr])
            a = jax.lax.dynamic_slice(d, (rho,), (S,))
            b = jax.lax.dynamic_slice(d, (S + rho - cnt,), (S,))
            s = jnp.arange(S, dtype=jnp.int32)
            return jnp.where(s < cnt - rho, a, b)

        return jax.vmap(one)(acc, count)

    bench("prefix rotation (2 dynslice)",
          partial(scan_epochs, prefix_rot), x)

    # --- element gather baseline for reference ------------------------
    perm_e = jax.vmap(lambda k: jax.random.permutation(k, S))(
        jax.random.split(key, R)).astype(jnp.int32)

    def elem(acc, e):
        p = (perm_e + e) % S
        return jax.vmap(lambda t, i: t[i])(acc, p)

    bench("element gather (131072 idx)", partial(scan_epochs, elem), x)


if __name__ == "__main__":
    main()

"""Mosaic feature probe for the multi-epoch fused kernel design.

Checks, on the real device, that a Pallas TPU kernel supports:
  1. a scalar ``lax.while_loop`` nested inside a ``fori_loop`` body
     (the in-kernel cycle-walk of the tile PRP),
  2. dynamic scalar reads from an SMEM array at a computed index
     (the per-(epoch, granule) mixing constants),
  3. VMEM row reads at a scalar computed by (1) (granule tile selects),
  4. an iota lane-mask select combining rows from two computed tiles.

Prints PASS/FAIL per feature; exits nonzero on any failure.
"""

from __future__ import annotations

import sys

import mfcd_tpu  # noqa: F401 — cache init
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(keys_ref, stream_ref, out_ref):
    e = pl.program_id(0)
    nb = stream_ref.shape[1]
    bs = stream_ref.shape[2]
    full = jnp.int32(nb - 1)

    def mix(x, c0, c1):
        x = (x * (c0 | jnp.uint32(1))) & jnp.uint32(nb * 2 - 1)
        x = x ^ (x >> jnp.uint32(2))
        return (x + c1) & jnp.uint32(nb * 2 - 1)

    def body(t, acc):
        # (2) dynamic SMEM scalar reads at a computed index
        c0 = keys_ref[e, 0].astype(jnp.uint32)
        c1 = keys_ref[e, 1].astype(jnp.uint32)
        # (1) scalar while_loop inside the fori body: cycle-walk onto
        # [0, full)
        x0 = mix(t.astype(jnp.uint32), c0, c1)

        def cond(x):
            return x >= jnp.uint32(full)

        x = jax.lax.while_loop(cond, lambda x: mix(x, c0, c1), x0)
        t2 = x.astype(jnp.int32)
        # (3) VMEM row reads at computed scalars + (4) lane-mask select
        a = stream_ref[0, t2, :]
        b = stream_ref[0, (t2 + 1) % nb, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bs,), 0)
        off = (e * 8) % bs
        y = jnp.where(lane >= off, a, b)
        return acc + jnp.sum(y.astype(jnp.float32))

    acc = jax.lax.fori_loop(0, nb, body, jnp.float32(0.0))
    out_ref[e, 0] = acc


def main():
    nb, bs, epochs = 16, 64, 3
    stream = jnp.arange(nb * bs, dtype=jnp.int32).reshape(1, nb, bs)
    keys = jnp.array([[3, 5], [7, 9], [11, 13]], dtype=jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(epochs,),
        in_specs=[
            pl.BlockSpec((epochs, 2), lambda e: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, bs), lambda e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((epochs, 1), lambda e: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((epochs, 1), jnp.float32),
    )(keys, stream)
    got = np.asarray(out)
    print("device:", jax.devices()[0])
    print("out:", got.ravel())
    ok = bool(np.all(np.isfinite(got)) and np.all(got > 0))
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

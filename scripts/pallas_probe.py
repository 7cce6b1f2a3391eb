"""Envelope probe for the Pallas fused-epoch kernel (VERDICT r1 item 2).

Runs ONE (rows, chunk_batches, runs) configuration per process so a TPU
worker crash doesn't take down the whole matrix; drive it from a shell
loop, strictly one process at a time (CLAUDE.md: never two TPU processes).

    python scripts/pallas_probe.py --rows 524288          # 2^19, known good
    python scripts/pallas_probe.py --rows 1048576         # crash envelope
    python scripts/pallas_probe.py --rows 262144 --chunk 512   # 8 chunks

Prints exactly one RESULT line: ``RESULT ok rows=... chunks=...`` or the
exception class, so the driver loop can tabulate.
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--chunk", type=int, default=None,
                    help="chunk_batches override (default: kernel heuristic)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--m", type=int, default=1000)
    ap.add_argument("--d", type=int, default=2)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=1,
                    help="sequential kernel launches (state round-trips)")
    ap.add_argument("--trainer", action="store_true",
                    help="drive train_runs_pallas (kernel inside lax.scan "
                         "with shuffle+gather) instead of the bare kernel")
    ap.add_argument("--check", action="store_true",
                    help="compare one small-config loss vs the jnp trainer")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import mfcd_tpu  # noqa: F401  (compile cache + matmul precision)
    from mfcd_tpu.ops.kernels import EpochState, pallas_train_epoch

    r, n, m, d, bs = args.runs, args.n, args.m, args.d, args.bs
    rows = args.rows
    num_batches = -(-rows // bs)
    print(f"device={jax.devices()[0]} rows={rows} batches={num_batches} "
          f"chunk={args.chunk or 'auto'} runs={r}", flush=True)

    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    state = EpochState(
        u_t=jax.random.normal(ks[0], (r, d, n), jnp.float32),
        v_t=jax.random.normal(ks[1], (r, d, m), jnp.float32),
        mu_u=jnp.zeros((r, d, n), jnp.float32),
        nu_u=jnp.zeros((r, d, n), jnp.float32),
        mu_v=jnp.zeros((r, d, m), jnp.float32),
        nu_v=jnp.zeros((r, d, m), jnp.float32),
    )
    pu = jax.random.randint(ks[2], (r, num_batches, bs), 0, n, jnp.int32)
    pi = jax.random.randint(ks[3], (r, num_batches, bs), 0, m, jnp.int32)
    pj = jax.random.randint(ks[4], (r, num_batches, bs), 0, m, jnp.int32)
    pj = jnp.where(pj == pi, (pj + 1) % m, pj)
    z = jax.random.bernoulli(ks[5], 0.5, (r, num_batches, bs)).astype(
        jnp.float32)
    lr = jnp.full((r,), 1e-3, jnp.float32)
    wd = jnp.full((r,), 1e-5, jnp.float32)
    count = jnp.full((r,), rows, jnp.int32)

    t0 = time.time()
    try:
        if args.trainer:
            from mfcd_tpu.data.btl import LabeledSplit
            from mfcd_tpu.models.mf import MFParams
            from mfcd_tpu.train.pallas_trainer import train_runs_pallas

            kt = jax.random.split(ks[6], 6)
            params = MFParams(
                U=jnp.swapaxes(state.u_t, 1, 2),
                V=jnp.swapaxes(state.v_t, 1, 2),
            )
            flat = lambda a: a.reshape(r, num_batches * bs)
            train = LabeledSplit(
                flat(pu), flat(pi), flat(pj), flat(z),
                jnp.arange(num_batches * bs)[None, :] < count[:, None],
                count,
            )
            vrows = 1024
            vu = jax.random.randint(kt[0], (r, vrows), 0, n, jnp.int32)
            vi = jax.random.randint(kt[1], (r, vrows), 0, m, jnp.int32)
            vj = jax.random.randint(kt[2], (r, vrows), 0, m, jnp.int32)
            vj = jnp.where(vj == vi, (vj + 1) % m, vj)
            vz = jax.random.bernoulli(kt[3], 0.5, (r, vrows)).astype(
                jnp.float32)
            val = LabeledSplit(vu, vi, vj, vz,
                               jnp.ones((r, vrows), bool),
                               jnp.full((r,), vrows, jnp.int32))
            ekeys = jax.random.split(kt[4], r)
            new_params, tl, vl = train_runs_pallas(
                params, train, val, ekeys, lr, wd,
                batch_size=bs, num_epochs=args.epochs)
            loss = jax.device_get(tl[:, -1])
            moved = float(jnp.abs(new_params.U).max())
        else:
            loss = None
            for e in range(args.epochs):
                step0 = jnp.full((r,), float(e * num_batches), jnp.float32)
                state, loss = pallas_train_epoch(
                    state, (pu, pi, pj, z), lr, wd, step0, count,
                    chunk_batches=args.chunk,
                )
            loss = jax.device_get(loss)
            moved = float(jnp.abs(state.u_t).max())
        ok = bool(jnp.all(jnp.isfinite(jnp.asarray(loss)))) and moved > 0
        dt = time.time() - t0
        print(f"RESULT {'ok' if ok else 'NONFINITE'} rows={rows} "
              f"chunk={args.chunk or 'auto'} loss={[round(float(x), 5) for x in loss]} "
              f"t={dt:.1f}s", flush=True)
        return 0 if ok else 2
    except BaseException as e:  # worker crashes raise RuntimeError subclasses
        print(f"RESULT FAIL rows={rows} chunk={args.chunk or 'auto'} "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())

"""Per-stage cost split of the fused-epoch Pallas kernel (device).

The bench-bucket profile puts the epoch kernel at ~45-53 ms/run — the
dominant term of a full training run.  Before attempting any kernel
rework (e.g. packing multiple runs into the sublane axis to undo the
d=2 -> 8-sublane padding waste of the dense Adam update), measure where
the per-step ~1.4 us actually goes.

Method: run variants of the production kernel body with stages ablated
(static flags), each keeping its outputs live by accumulating a cheap
reduction into the loss output so Mosaic cannot DCE the ablated
remainder.  All variants execute the same fori_loop trip counts.

  full        : oh build + contract + logits/BCE + scatter + Adam
  no_adam     : everything except the Adam moment/param update writes
  no_scatter  : oh build + contract + logits/BCE only
  oh_only     : oh build + a trivial reduction of the one-hots
  loop_only   : loop + stream read + unpack only (floor)

On-chip verdicts for the one-hot build reworks (2026-08-19, bench shape,
all vs production full_split3d at 1.325 us/run-step):

  - hoisting the loop-invariant iotas out of the fori_loop: SLOWER
    (1.395; oh_only_hoist 0.936 vs oh_only 0.866) — Mosaic
    rematerializes iota generation essentially for free inside the loop,
    and the hoisted [bs, n] values add VMEM/register pressure instead;
  - fused signed select for oh_d (2 cmps + 2 sels vs 2 cmps + 2 converts
    + 1 sub): 1.315 — under 1%, inside session noise.  Both REJECTED;
    the production kernel keeps the straightforward in-loop build.
  - factored two-level one-hot: see _factored_kernel below (REJECTED).

Differences between adjacent rows estimate each stage's cost.  Stage
times are per-epoch for the canonical bench bucket (R=8 runs, n=m=1000,
d=2, p=0.2 -> 1250 batches of 64).

Usage (single TPU process; serialize with the session flock):
    python scripts/profile_kernel_split.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import mfcd_tpu  # noqa: F401  (compile cache + matmul precision)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfcd_tpu.ops.kernels import EpochState

_F32 = jnp.float32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _variant_kernel(
    lr_ref, wd_ref, step0_ref, count_ref, *refs,
    b1: float, b2: float, eps: float, pack: tuple, stages: tuple,
    oh_dtype=jnp.float32,
):
    """The production kernel body (packed "full" mode) with stage flags.

    ``stages`` is a subset of {"oh", "contract", "scatter", "adam"};
    later stages require earlier ones (enforced by the caller).
    ``oh_dtype=bfloat16`` builds the one-hot operands in bf16: 0/±1 are
    exact in bf16 and every MXU product against them is exact, so the
    gather/scatter results are bit-identical while the build writes half
    the bytes and the matmul needs fewer MXU passes.
    """
    mode, bits_n, bits_m, bits_z, denom = pack
    assert mode == "full"
    stream_refs = refs[:1]
    (u_out, v_out, mu_u_out, nu_u_out, mu_v_out, nu_v_out,
     loss_out) = refs[1 + 6:]
    d, n = u_out.shape[1], u_out.shape[2]
    m = v_out.shape[2]
    chunk = stream_refs[0].shape[1]
    bs = stream_refs[0].shape[2]
    run = pl.program_id(0)
    ci = pl.program_id(1)
    lr = lr_ref[run, 0]
    wd = wd_ref[run, 0]
    step0 = step0_ref[run, 0]
    count = count_ref[run, 0]
    num_exec = (count + bs - 1) // bs
    base = ci * chunk
    local_exec = jnp.clip(num_exec - base, 0, chunk)
    log_b1 = jnp.log(jnp.float32(b1))
    log_b2 = jnp.log(jnp.float32(b2))

    prec = (jax.lax.Precision.DEFAULT if "default_prec" in stages
            else jax.lax.Precision.HIGHEST)

    def contract(table_t, oh):
        return jax.lax.dot_general(
            table_t, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32, precision=prec)

    def scatter(grad_rows, oh):
        return jax.lax.dot_general(
            grad_rows, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32, precision=prec)

    def split3(v):
        """Exact 3-term bf16 split: v == hi + mid + lo (f32 sums exact)."""
        hi = v.astype(jnp.bfloat16)
        r1 = v - hi.astype(_F32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(_F32)).astype(jnp.bfloat16)
        return hi, mid, lo

    if "split3" in stages:
        def contract(table_t, oh):  # noqa: F811 — variant override
            ohb = oh.astype(jnp.bfloat16)
            acc = None
            for part in split3(table_t):
                term = jax.lax.dot_general(
                    part, ohb, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32)
                acc = term if acc is None else acc + term
            return acc

        def scatter(grad_rows, oh):  # noqa: F811 — variant override
            ohb = oh.astype(jnp.bfloat16)
            acc = None
            for part in split3(grad_rows):
                term = jax.lax.dot_general(
                    part, ohb, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32)
                acc = term if acc is None else acc + term
            return acc

    if "split3d" in stages:
        # Exact 3x 1-pass scheme with ALL-f32 operands: each value part
        # is bf16-representable, so DEFAULT's operand truncation is
        # exact; the one-hot's 0/±1 are exact in bf16 too.  3 passes
        # total vs HIGHEST's 6, with no bf16 arrays (Mosaic tiling-safe).
        def split3_f32(v):
            hi = v.astype(jnp.bfloat16).astype(_F32)
            r1 = v - hi
            mid = r1.astype(jnp.bfloat16).astype(_F32)
            lo = r1 - mid
            return hi, mid, lo

        def contract(table_t, oh):  # noqa: F811 — variant override
            acc = None
            for part in split3_f32(table_t):
                term = jax.lax.dot_general(
                    part, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.DEFAULT)
                acc = term if acc is None else acc + term
            return acc

        def scatter(grad_rows, oh):  # noqa: F811 — variant override
            acc = None
            for part in split3_f32(grad_rows):
                term = jax.lax.dot_general(
                    part, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.DEFAULT)
                acc = term if acc is None else acc + term
            return acc

    # Loop-invariant one-hot iotas, hoisted out of the fori_loop body for
    # the "hoist" variants (measures whether Mosaic's LICM already does
    # this; the production kernel regenerates them every step).
    hoist = "hoist" in stages or "hoist_fsel" in stages
    if hoist:
        iota_n_h = jax.lax.broadcasted_iota(jnp.int32, (bs, n), 1)
        iota_m_h = (iota_n_h if m == n
                    else jax.lax.broadcasted_iota(jnp.int32, (bs, m), 1))
        iota_bs_h = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)

    def body(tl, loss_sum):
        t = base + tl
        y = stream_refs[0][0, tl, :]
        idx_u = y & ((1 << bits_n) - 1)
        idx_i = (y >> bits_n) & ((1 << bits_m) - 1)
        idx_j = (y >> (bits_n + bits_m)) & ((1 << bits_m) - 1)
        k = (y >> (bits_n + 2 * bits_m)) & ((1 << bits_z) - 1)
        z = (k.astype(_F32) / jnp.float32(denom)).reshape(1, bs)
        lane_iota = (iota_bs_h if hoist
                     else jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1))
        slots = t * bs + lane_iota
        mask = (slots < count).astype(_F32)

        if "oh" not in stages:
            # Floor: keep the unpack + mask live with a cheap reduction.
            return (loss_sum + jnp.sum(z * mask)
                    + jnp.sum(idx_u.astype(_F32)) * 1e-9
                    + jnp.sum(idx_i.astype(_F32)) * 1e-9
                    + jnp.sum(idx_j.astype(_F32)) * 1e-9)

        iota_n = (iota_n_h if hoist
                  else jax.lax.broadcasted_iota(jnp.int32, (bs, n), 1))
        iota_m = (iota_m_h if hoist
                  else jax.lax.broadcasted_iota(jnp.int32, (bs, m), 1))
        oh_u = (iota_n == idx_u[:, None]).astype(oh_dtype)
        if "hoist_fsel" in stages:
            # Fused signed select: 2 compares + 2 selects instead of
            # 2 compares + 2 converts + 1 subtract.  Differs from the
            # subtract form only at i == j (gives +1 instead of 0), which
            # the samplers exclude on valid rows.
            oh_d = jnp.where(
                iota_m == idx_i[:, None], jnp.float32(1.0),
                jnp.where(iota_m == idx_j[:, None], jnp.float32(-1.0),
                          jnp.float32(0.0))).astype(oh_dtype)
        else:
            oh_d = ((iota_m == idx_i[:, None]).astype(oh_dtype)
                    - (iota_m == idx_j[:, None]).astype(oh_dtype))

        if "contract" not in stages:
            # Keep both one-hots live: a masked row-sum is ~free next to
            # their construction.
            return (loss_sum
                    + jnp.sum(oh_u.astype(_F32) * mask[0][:, None]) * 1e-9
                    + jnp.sum(oh_d.astype(_F32) * mask[0][:, None]) * 1e-9)

        u_mat = u_out[0]
        v_mat = v_out[0]
        eu = contract(u_mat, oh_u)
        dv = contract(v_mat, oh_d)
        logits = jnp.sum(eu * dv, axis=0, keepdims=True)
        bce = (jnp.maximum(logits, 0.0) - logits * z
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        cnt = jnp.sum(mask)
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        loss = jnp.sum(bce * mask) * inv_cnt
        g = (jax.nn.sigmoid(logits) - z) * mask * inv_cnt

        if "scatter" not in stages:
            return loss_sum + loss + jnp.sum(g) * 1e-9

        g_u_rows = g * dv
        g_v_rows = g * eu
        grad_u = scatter(g_u_rows, oh_u)
        grad_v = scatter(g_v_rows, oh_d)

        if "adam" not in stages:
            return (loss_sum + loss + jnp.sum(grad_u) * 1e-9
                    + jnp.sum(grad_v) * 1e-9)

        t_step = step0 + (t + 1).astype(_F32)
        bc1 = 1.0 - jnp.exp(t_step * log_b1)
        bc2 = 1.0 - jnp.exp(t_step * log_b2)

        def update(p_ref, mu_ref, nu_ref, grad):
            p = p_ref[0]
            grad = grad + wd * p
            mu = b1 * mu_ref[0] + (1.0 - b1) * grad
            nu = b2 * nu_ref[0] + (1.0 - b2) * grad * grad
            p_ref[0] = p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            mu_ref[0] = mu
            nu_ref[0] = nu

        update(u_out, mu_u_out, nu_u_out, grad_u)
        update(v_out, mu_v_out, nu_v_out, grad_v)
        return loss_sum + loss

    loss_sum = jax.lax.fori_loop(0, local_exec, body, jnp.float32(0.0))

    @pl.when(ci == 0)
    def _():
        loss_out[run, 0] = 0.0

    loss_out[run, 0] += loss_sum / jnp.maximum(num_exec.astype(_F32), 1.0)


@functools.partial(jax.jit, static_argnames=("pack", "stages", "oh_bf16"))
def _run_variant(state: EpochState, stream, lr, wd, step0, count,
                 pack: tuple, stages: tuple, oh_bf16: bool = False):
    r, d, n = state.u_t.shape
    m = state.v_t.shape[2]
    num_batches = stream[0].shape[1]
    bs = stream[0].shape[2]
    chunk = max(1, min(num_batches, (512 * 1024) // (bs * 4)))
    n_chunks = -(-num_batches // chunk)
    pad_b = n_chunks * chunk - num_batches
    if pad_b:
        stream = tuple(
            jnp.pad(a, ((0, 0), (0, pad_b), (0, 0))) for a in stream)

    spec_n = pl.BlockSpec((1, d, n), lambda i, c: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, d, m), lambda i, c: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    batch_spec = pl.BlockSpec((1, chunk, bs), lambda i, c: (i, c, 0),
                              memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((r, 1), lambda i, c: (0, 0),
                               memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _variant_kernel, b1=0.9, b2=0.999, eps=1e-8, pack=pack,
        stages=stages,
        oh_dtype=jnp.bfloat16 if oh_bf16 else jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(r, n_chunks),
        in_specs=[scalar_spec] * 4 + [batch_spec]
                 + [spec_n, spec_m, spec_n, spec_n, spec_m, spec_m],
        out_specs=[spec_n, spec_m, spec_n, spec_n, spec_m, spec_m,
                   scalar_spec],
        out_shape=[
            jax.ShapeDtypeStruct((r, d, n), _F32),
            jax.ShapeDtypeStruct((r, d, m), _F32),
            jax.ShapeDtypeStruct((r, d, n), _F32),
            jax.ShapeDtypeStruct((r, d, n), _F32),
            jax.ShapeDtypeStruct((r, d, m), _F32),
            jax.ShapeDtypeStruct((r, d, m), _F32),
            jax.ShapeDtypeStruct((r, 1), _F32),
        ],
        input_output_aliases={5 + k: k for k in range(6)},
    )(lr.reshape(r, 1), wd.reshape(r, 1), step0.reshape(r, 1),
      count.astype(jnp.int32).reshape(r, 1), *stream,
      state.u_t, state.v_t, state.mu_u, state.nu_u, state.mu_v, state.nu_v)
    return EpochState(*out[:6]), out[6][:, 0]




def _factored_kernel(
    lr_ref, wd_ref, step0_ref, count_ref, *refs,
    b1: float, b2: float, eps: float, pack: tuple,
):
    """Two-level factored one-hot prototype — MEASURED AND REJECTED.

    idx = hi * L + lo with L = 128: gathers/scatters run as contractions
    against tiny [bs, H] / [bs, L] one-hots, with the table state held in
    a dense [H, d*L] layout (d packed into lanes — no sublane padding
    waste) and the exact split-3 parts CONCATENATED along the contraction
    axis so each gather/scatter is ONE DEFAULT-precision dot.

    On-chip verdict (2026-08-18, bench shape): value-correct (final U
    allclose vs the production kernel, max |delta| 2.4e-7) but SLOWER —
    2.06 vs 1.52 us/run-step in the same session: the per-step state
    re-split + per-d lane reductions + 6 small dots cost more than the
    wide one-hot builds they replace.  Kept as the measurement record.
    """
    mode, bits_n, bits_m, bits_z, denom = pack
    stream_refs = refs[:1]
    (u_out, v_out, mu_u_out, nu_u_out, mu_v_out, nu_v_out,
     loss_out) = refs[1 + 6:]
    # State layout here: [H, d*L] (H=8 sublanes, lanes = d*L).
    hsub, dl = u_out.shape[1], u_out.shape[2]
    L = 128
    d = dl // L
    chunk = stream_refs[0].shape[1]
    bs = stream_refs[0].shape[2]
    run = pl.program_id(0)
    ci = pl.program_id(1)
    lr = lr_ref[run, 0]
    wd = wd_ref[run, 0]
    step0 = step0_ref[run, 0]
    count = count_ref[run, 0]
    num_exec = (count + bs - 1) // bs
    base = ci * chunk
    local_exec = jnp.clip(num_exec - base, 0, chunk)
    log_b1 = jnp.log(jnp.float32(b1))
    log_b2 = jnp.log(jnp.float32(b2))

    def split3cat(state2d):
        hi = state2d.astype(jnp.bfloat16).astype(_F32)
        r1 = state2d - hi
        mid = r1.astype(jnp.bfloat16).astype(_F32)
        lo = r1 - mid
        return jnp.concatenate([hi, mid, lo], axis=0)   # [3H, dl]

    def onehots(idx):
        hi = idx >> 7
        lo = idx & 127
        oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (bs, hsub), 1)
                 == hi[:, None]).astype(_F32)           # [bs, H]
        oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (bs, L), 1)
                 == lo[:, None]).astype(_F32)           # [bs, L]
        return oh_hi, oh_lo

    def gather(state_cat, oh_hi, oh_lo):
        # ONE dot: [bs, 3H] x [3H, dl] -> [bs, dl]; then per-d lane
        # reduction against oh_lo.
        oh3 = jnp.concatenate([oh_hi, oh_hi, oh_hi], axis=1)
        tmp = jax.lax.dot_general(
            oh3, state_cat, ((((1,), (0,))), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.DEFAULT)        # [bs, dl]
        rows = []
        for dd in range(d):
            seg = tmp[:, dd * L:(dd + 1) * L]
            rows.append(jnp.sum(seg * oh_lo, axis=1, keepdims=True))
        return jnp.concatenate(rows, axis=1)            # [bs, d]

    def scatter_fac(g_rows, oh_hi, oh_lo):
        # g_rows [bs, d] -> s1 [bs, dl]; ONE dot [H, 3bs] x [3bs, dl].
        segs = []
        for dd in range(d):
            segs.append(g_rows[:, dd:dd + 1] * oh_lo)   # [bs, L]
        s1 = jnp.concatenate(segs, axis=1)              # [bs, dl]
        s1hi = s1.astype(jnp.bfloat16).astype(_F32)
        r1 = s1 - s1hi
        s1mid = r1.astype(jnp.bfloat16).astype(_F32)
        s1lo = r1 - s1mid
        s1cat = jnp.concatenate([s1hi, s1mid, s1lo], axis=0)  # [3bs, dl]
        oh3 = jnp.concatenate([oh_hi, oh_hi, oh_hi], axis=0)  # [3bs, H]
        return jax.lax.dot_general(
            oh3, s1cat, ((((0,), (0,))), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.DEFAULT)        # [H, dl]

    def body(tl, loss_sum):
        t = base + tl
        y = stream_refs[0][0, tl, :]
        idx_u = y & ((1 << bits_n) - 1)
        idx_i = (y >> bits_n) & ((1 << bits_m) - 1)
        idx_j = (y >> (bits_n + bits_m)) & ((1 << bits_m) - 1)
        k = (y >> (bits_n + 2 * bits_m)) & ((1 << bits_z) - 1)
        z = (k.astype(_F32) / jnp.float32(denom)).reshape(1, bs)
        slots = t * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        mask = (slots < count).astype(_F32)

        u_cat = split3cat(u_out[0])
        v_cat = split3cat(v_out[0])
        ohu = onehots(idx_u)
        ohi = onehots(idx_i)
        ohj = onehots(idx_j)

        eu = gather(u_cat, *ohu)                        # [bs, d]
        vi = gather(v_cat, *ohi)
        vj = gather(v_cat, *ohj)
        dv = vi - vj
        logits = jnp.sum(eu * dv, axis=1).reshape(1, bs)

        bce = (jnp.maximum(logits, 0.0) - logits * z
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        cnt = jnp.sum(mask)
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        loss = jnp.sum(bce * mask) * inv_cnt
        g = ((jax.nn.sigmoid(logits) - z) * mask * inv_cnt)  # [1, bs]
        gT = g.reshape(bs, 1)

        grad_u = scatter_fac(gT * dv, *ohu)             # [H, dl]
        grad_vi = scatter_fac(gT * eu, *ohi)
        grad_vj = scatter_fac(-(gT * eu), *ohj)
        grad_v = grad_vi + grad_vj

        t_step = step0 + (t + 1).astype(_F32)
        bc1 = 1.0 - jnp.exp(t_step * log_b1)
        bc2 = 1.0 - jnp.exp(t_step * log_b2)

        def update(p_ref, mu_ref, nu_ref, grad):
            p = p_ref[0]
            grad = grad + wd * p
            mu = b1 * mu_ref[0] + (1.0 - b1) * grad
            nu = b2 * nu_ref[0] + (1.0 - b2) * grad * grad
            p_ref[0] = p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            mu_ref[0] = mu
            nu_ref[0] = nu

        update(u_out, mu_u_out, nu_u_out, grad_u)
        update(v_out, mu_v_out, nu_v_out, grad_v)
        return loss_sum + loss

    loss_sum = jax.lax.fori_loop(0, local_exec, body, jnp.float32(0.0))

    @pl.when(ci == 0)
    def _():
        loss_out[run, 0] = 0.0

    loss_out[run, 0] += loss_sum / jnp.maximum(num_exec.astype(_F32), 1.0)


def to_factored_layout(a):
    """[R, d, n] f32 -> [R, H=8, d*128] (n = H*128 exactly)."""
    import numpy as np

    r, d, n = a.shape
    h = n // 128
    assert h * 128 == n and h == 8
    # [R, d, H, L] -> [R, H, d, L] -> [R, H, d*L]
    return jnp.asarray(np.transpose(np.asarray(a).reshape(r, d, h, 128),
                                    (0, 2, 1, 3)).reshape(r, h, d * 128))


def from_factored_layout(a, d):
    import numpy as np

    r, h, dl = a.shape
    L = 128
    return np.transpose(np.asarray(a).reshape(r, h, d, L),
                        (0, 2, 1, 3)).reshape(r, d, h * L)


@functools.partial(jax.jit, static_argnames=("pack",))
def _run_factored(state_f, stream, lr, wd, step0, count, pack: tuple):
    """state_f: EpochState-like tuple in [R, 8, d*128] layout."""
    r, hsub, dl = state_f[0].shape
    num_batches = stream[0].shape[1]
    bs = stream[0].shape[2]
    chunk = max(1, min(num_batches, (512 * 1024) // (bs * 4)))
    n_chunks = -(-num_batches // chunk)
    pad_b = n_chunks * chunk - num_batches
    if pad_b:
        stream = tuple(
            jnp.pad(a, ((0, 0), (0, pad_b), (0, 0))) for a in stream)
    spec = pl.BlockSpec((1, hsub, dl), lambda i, c: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    batch_spec = pl.BlockSpec((1, chunk, bs), lambda i, c: (i, c, 0),
                              memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((r, 1), lambda i, c: (0, 0),
                               memory_space=pltpu.SMEM)
    kernel = functools.partial(_factored_kernel, b1=0.9, b2=0.999,
                               eps=1e-8, pack=pack)
    out = pl.pallas_call(
        kernel,
        grid=(r, n_chunks),
        in_specs=[scalar_spec] * 4 + [batch_spec] + [spec] * 6,
        out_specs=[spec] * 6 + [scalar_spec],
        out_shape=[jax.ShapeDtypeStruct((r, hsub, dl), _F32)] * 6
                  + [jax.ShapeDtypeStruct((r, 1), _F32)],
        input_output_aliases={5 + k: k for k in range(6)},
    )(lr.reshape(r, 1), wd.reshape(r, 1), step0.reshape(r, 1),
      count.astype(jnp.int32).reshape(r, 1), *stream, *state_f)
    return out[:6], out[6][:, 0]


VARIANTS = {
    "loop_only": ((), False),
    "oh_only": (("oh",), False),
    "no_scatter": (("oh", "contract"), False),
    "no_adam": (("oh", "contract", "scatter"), False),
    "full": (("oh", "contract", "scatter", "adam"), False),
    "oh_only_bf16": (("oh",), True),
    "full_default_prec": (
        ("oh", "contract", "scatter", "adam", "default_prec"), False),
    "full_split3": (("oh", "contract", "scatter", "adam", "split3"), False),
    "full_split3d": (
        ("oh", "contract", "scatter", "adam", "split3d"), False),
    "oh_only_hoist": (("oh", "hoist"), False),
    "full_split3d_hoist": (
        ("oh", "contract", "scatter", "adam", "split3d", "hoist"), False),
    "full_split3d_hfsel": (
        ("oh", "contract", "scatter", "adam", "split3d", "hoist",
         "hoist_fsel"), False),
}


def main():
    # Canonical bench-bucket shape: R=8, n=m=1000, d=2, p=0.2, bs=64.
    r, n, m, d, bs = 8, 1000, 1000, 2, 64
    rows = 80000
    num_batches = -(-rows // bs)
    bits_n = (n - 1).bit_length()
    bits_m = (m - 1).bit_length()
    pack = ("full", bits_n, bits_m, 1, 1)

    key = jax.random.key(0)
    ku, kv, kr = jax.random.split(key, 3)
    state = EpochState(
        u_t=jax.random.normal(ku, (r, d, n), _F32),
        v_t=jax.random.normal(kv, (r, d, m), _F32),
        mu_u=jnp.zeros((r, d, n), _F32), nu_u=jnp.zeros((r, d, n), _F32),
        mu_v=jnp.zeros((r, d, m), _F32), nu_v=jnp.zeros((r, d, m), _F32),
    )
    padded = num_batches * bs
    ks = jax.random.split(kr, 4)
    u_idx = jax.random.randint(ks[0], (r, padded), 0, n)
    i_idx = jax.random.randint(ks[1], (r, padded), 0, m)
    j_idx = (i_idx + 1 + jax.random.randint(ks[2], (r, padded), 0, m - 1)) % m
    zbit = jax.random.bernoulli(ks[3], 0.5, (r, padded)).astype(jnp.int32)
    packed = (u_idx | (i_idx << bits_n) | (j_idx << (bits_n + bits_m))
              | (zbit << (bits_n + 2 * bits_m)))
    stream = (packed.reshape(r, num_batches, bs),)

    lr = jnp.full((r,), 1e-3, _F32)
    wd = jnp.full((r,), 5e-6, _F32)
    step0 = jnp.zeros((r,), _F32)
    count = jnp.full((r,), rows, jnp.int32)

    reps = 5
    results = {}
    final_states = {}
    for name, (stages, oh_bf16) in VARIANTS.items():
        try:
            st, loss = _run_variant(state, stream, lr, wd, step0, count,
                                    pack=pack, stages=stages,
                                    oh_bf16=oh_bf16)
            jax.block_until_ready(st)           # compile + warm
        except Exception as e:  # noqa: BLE001 — report unsupported variants
            log(f"{name:12s}: UNSUPPORTED ({type(e).__name__}: "
                f"{str(e)[:200]})")
            results[name] = {"unsupported": True}
            continue
        t0 = time.time()
        for _ in range(reps):
            st, loss = _run_variant(state, stream, lr, wd, step0, count,
                                    pack=pack, stages=stages,
                                    oh_bf16=oh_bf16)
        jax.block_until_ready(st)
        per_epoch = (time.time() - t0) / reps
        per_step_us = per_epoch / (r * num_batches) * 1e6
        results[name] = {"s_per_epoch": round(per_epoch, 4),
                         "us_per_run_step": round(per_step_us, 3)}
        final_states[name] = jax.device_get(st.u_t)
        log(f"{name:12s}: {per_epoch:.4f} s/epoch-bucket "
            f"({per_step_us:.3f} us/run-step)  loss0={float(loss[0]):.4f}")

    # --- factored two-level one-hot prototype ---
    try:
        pad_n = 1024
        def padded3(arr):
            return jnp.pad(arr, ((0, 0), (0, 0), (0, pad_n - arr.shape[2])))
        state_f = tuple(to_factored_layout(padded3(a)) for a in state)
        reps_f = reps
        sf, loss = _run_factored(state_f, stream, lr, wd, step0, count,
                                 pack=pack)
        jax.block_until_ready(sf)
        t0 = time.time()
        for _ in range(reps_f):
            sf, loss = _run_factored(state_f, stream, lr, wd, step0, count,
                                     pack=pack)
        jax.block_until_ready(sf)
        per_epoch = (time.time() - t0) / reps_f
        per_step_us = per_epoch / (r * num_batches) * 1e6
        results["full_factored"] = {"s_per_epoch": round(per_epoch, 4),
                                    "us_per_run_step": round(per_step_us, 3)}
        log(f"full_factored: {per_epoch:.4f} s/epoch-bucket "
            f"({per_step_us:.3f} us/run-step)  loss0={float(loss[0]):.4f}")
        if "full" in final_states:
            import numpy as np

            u_back = from_factored_layout(sf[0], d)[:, :, :n]
            ref = final_states["full"]
            close = bool(np.allclose(u_back, ref, rtol=1e-4, atol=1e-6))
            maxd = float(np.max(np.abs(u_back - ref)))
            log(f"factored final U allclose vs full: {close} "
                f"(max |delta| {maxd:.2e})")
            results["full_factored"]["allclose_vs_full"] = close
            results["full_factored"]["max_delta_vs_full"] = maxd
    except Exception as e:  # noqa: BLE001 — report unsupported prototype
        log(f"full_factored: UNSUPPORTED ({type(e).__name__}: "
            f"{str(e)[:300]})")
        results["full_factored"] = {"unsupported": True}

    order = ["loop_only", "oh_only", "no_scatter", "no_adam", "full"]
    split = {}
    for a, b in zip(order, order[1:]):
        if "us_per_run_step" in results.get(a, {}) and \
                "us_per_run_step" in results.get(b, {}):
            split[f"{b}-{a}"] = round(results[b]["us_per_run_step"]
                                      - results[a]["us_per_run_step"], 3)
    import numpy as np

    bitexact = {}
    for variant in ("full_bf16oh", "full_split3", "full_default_prec",
                    "full_split3d"):
        if "full" in final_states and variant in final_states:
            bitexact[variant] = bool(np.array_equal(
                final_states["full"], final_states[variant]))
            log(f"{variant} final U state bit-exact vs full: "
                f"{bitexact[variant]}")
    # Hoist variants change instruction scheduling only — they must be
    # bit-exact vs the production split3d scheme.
    for variant in ("full_split3d_hoist", "full_split3d_hfsel"):
        if "full_split3d" in final_states and variant in final_states:
            bitexact[variant + "_vs_split3d"] = bool(np.array_equal(
                final_states["full_split3d"], final_states[variant]))
            log(f"{variant} final U state bit-exact vs full_split3d: "
                f"{bitexact[variant + '_vs_split3d']}")
    log(f"stage deltas (us/run-step): {split}")
    print(json.dumps({"variants": results, "stage_deltas_us": split,
                      "bitexact_vs_full": bitexact,
                      "shape": {"r": r, "n": n, "m": m, "d": d, "bs": bs,
                                "batches": num_batches}}))


if __name__ == "__main__":
    main()

"""Hot-path kernels: one-hot MXU embedding ops + a Pallas fused-epoch kernel.

The training inner loop (reference ``structure.py:787-795, 845-852``) is a
row gather from U/V, a d-length dot, a sigmoid/BCE, and a scatter-add of the
gradient back into the gathered rows, followed by a dense Adam update.  At
the reference's scale (n=m=1000, d=2, batch 64) the arrays are tiny and the
cost is per-step overhead, not FLOPs.  Two TPU-native designs:

1. **One-hot MXU path** (`onehot_forward_logits`): express the gather as
   ``onehot(idx) @ table``.  The MXU does the gather, and autodiff turns the
   backward scatter-add into the transposed matmul ``onehot.T @ grad`` — no
   XLA scatter at all.  Exact because one-hot matmuls move values untouched
   (matmul precision is pinned to "highest", see ``mfcd_tpu.cache``).

2. **Pallas fused-epoch kernel** (`pallas_train_epoch`): one kernel per
   epoch per run keeps U, V, and the Adam moments resident in VMEM in a
   transposed ``[d, n]`` layout (features on sublanes, rows on lanes) and
   loops over all minibatches on-chip — forward one-hot matmuls, BCE
   gradient, transposed-matmul scatter, and the coupled-weight-decay Adam
   update, with zero HBM round-trips between steps.  Runs are mapped onto
   the Pallas grid.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfcd_tpu.models.mf import MFParams

_F32 = jnp.float32


def onehot(idx: jax.Array, depth: int) -> jax.Array:
    """[B] int32 -> [B, depth] f32 one-hot (iota compare; no scatter)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], depth), 1)
    return (iota == idx[:, None]).astype(_F32)


def onehot_forward_logits(params: MFParams, u, i, j) -> jax.Array:
    """MXU-friendly forward: logits = sum_d (O_u U) * (O_i V - O_j V).

    Gradients flow through the matmuls, so the backward pass is transposed
    one-hot matmuls (MXU scatter-add) instead of XLA scatters.
    """
    n = params.U.shape[0]
    m = params.V.shape[0]
    eu = onehot(u, n) @ params.U
    dv = (onehot(i, m) - onehot(j, m)) @ params.V
    return jnp.sum(eu * dv, axis=-1)


class EpochState(NamedTuple):
    """Transposed-layout training state carried across Pallas epochs."""

    u_t: jax.Array    # [R, d, n]
    v_t: jax.Array    # [R, d, m]
    mu_u: jax.Array   # [R, d, n]
    nu_u: jax.Array   # [R, d, n]
    mu_v: jax.Array   # [R, d, m]
    nu_v: jax.Array   # [R, d, m]


def _epoch_kernel(
    # SMEM scalar operands (full [R, 1] blocks indexed by program_id)
    lr_ref, wd_ref, step0_ref, count_ref,
    # variable-arity tail: stream refs, aliased state inputs, outputs
    *refs, b1: float, b2: float, eps: float, pack: tuple,
):
    mode, bits_n, bits_m, bits_z, denom = pack
    n_stream = {"full": 1, "uij": 2, "none": 4}[mode]
    stream_refs = refs[:n_stream]
    # state inputs refs[n_stream:n_stream+6] are aliased to the outputs
    (u_out, v_out, mu_u_out, nu_u_out, mu_v_out, nu_v_out,
     loss_out) = refs[n_stream + 6:]
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
    # Dynamic trip count: only batches containing valid rows execute
    # (matches the reference loader's len = ceil(count / batch)).  The
    # batch axis is split into VMEM-sized chunks along grid dim 1; the
    # state blocks are indexed by the run only, so they stay resident in
    # VMEM across a run's whole chunk sweep.
    num_exec = (count + bs - 1) // bs
    base = ci * chunk
    local_exec = jnp.clip(num_exec - base, 0, chunk)
    log_b1 = jnp.log(jnp.float32(b1))
    log_b2 = jnp.log(jnp.float32(b2))

    # One-hot matmuls as THREE 1-pass (DEFAULT-precision) dots over an
    # exact 3-term bf16-representable split of the value operand, instead
    # of one 6-pass HIGHEST dot: value-exact and ~27% faster per step on
    # the bench shape (1.31 vs 1.79 us/run-step,
    # scripts/profile_kernel_split.py).
    #
    # Exactness: v == hi + mid + lo with every term bf16-REPRESENTABLE
    # (Dekker-style split; 3 x 8 mantissa bits cover f32's 24), so
    # DEFAULT's operand truncation is the identity, every product against
    # the one-hot's exact 0/±1 is exact, and f32 accumulation of the
    # one-nonzero gather sums reproduces v bit-for-bit.  Scatter sums
    # over duplicate rows are value-exact too, but the SUMMATION ORDER
    # (three complete per-term sums added last) differs from HIGHEST's
    # interleaved pass accumulation by ~1 ulp per duplicated row — the
    # pallas-vs-jnp equivalence is therefore pinned at allclose
    # (tests/test_pallas.py rtol<=2e-3) rather than bitwise, while
    # sharded==unsharded stays bit-exact (same kernel on both sides).
    # Mosaic lowers only DEFAULT/HIGHEST dot precisions (HIGH raises
    # NotImplementedError), and bf16 ARRAYS trip sublane tiling at d<16 —
    # all-f32 operands with DEFAULT precision sidestep both.
    def _split3(v):
        hi = v.astype(jnp.bfloat16).astype(_F32)
        r1 = v - hi
        mid = r1.astype(jnp.bfloat16).astype(_F32)
        lo = r1 - mid
        return hi, mid, lo

    def _dot3(value, oh, dims):
        acc = None
        for part in _split3(value):
            term = jax.lax.dot_general(
                part, oh, (dims, ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.DEFAULT,
            )
            acc = term if acc is None else acc + term
        return acc

    def contract(table_t, oh):
        # [d, N] x [bs, N] -> [d, bs]
        return _dot3(table_t, oh, ((1,), (1,)))

    def scatter(grad_rows, oh):
        # [d, bs] x [bs, N] -> [d, N]
        return _dot3(grad_rows, oh, ((1,), (0,)))

    def body(tl, loss_sum):
        t = base + tl
        # Unpack the batch in-registers.  Packed modes read ONE int32 word
        # per row from VMEM (vs four HBM-materialized arrays per epoch in
        # the old design); the shift/mask unpack is free VPU work and the
        # f32 division k/denom is the identical IEEE op the host-side
        # unpack performed, so results are bit-equal.
        if mode == "none":
            idx_u = stream_refs[0][0, tl, :]
            idx_i = stream_refs[1][0, tl, :]
            idx_j = stream_refs[2][0, tl, :]
            z = stream_refs[3][0, tl, :].reshape(1, bs)
        else:
            y = stream_refs[0][0, tl, :]
            idx_u = y & ((1 << bits_n) - 1)
            idx_i = (y >> bits_n) & ((1 << bits_m) - 1)
            idx_j = (y >> (bits_n + bits_m)) & ((1 << bits_m) - 1)
            if mode == "full":
                k = (y >> (bits_n + 2 * bits_m)) & ((1 << bits_z) - 1)
                z = (k.astype(_F32) / jnp.float32(denom)).reshape(1, bs)
            else:
                z = stream_refs[1][0, tl, :].reshape(1, bs)
        slots = t * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        mask = (slots < count).astype(_F32)

        oh_u = (jax.lax.broadcasted_iota(jnp.int32, (bs, n), 1)
                == idx_u[:, None]).astype(_F32)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (bs, m), 1)
        # Signed one-hot difference: +1 at column i, -1 at column j (0 when
        # i == j, which the samplers exclude).  Shared by the forward
        # contraction and the backward scatter — the same structure the jnp
        # path's autodiff produces for ``(onehot(i) - onehot(j)) @ V``
        # (kernels.onehot_forward_logits).
        oh_d = ((iota_m == idx_i[:, None]).astype(_F32)
                - (iota_m == idx_j[:, None]).astype(_F32))

        u_mat = u_out[0]
        v_mat = v_out[0]
        eu = contract(u_mat, oh_u)                 # [d, bs]
        dv = contract(v_mat, oh_d)                 # [d, bs]
        logits = jnp.sum(eu * dv, axis=0, keepdims=True)  # [1, bs]

        # Stable BCE and its gradient.
        bce = (jnp.maximum(logits, 0.0) - logits * z
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        cnt = jnp.sum(mask)
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        loss = jnp.sum(bce * mask) * inv_cnt
        g = (jax.nn.sigmoid(logits) - z) * mask * inv_cnt  # [1, bs]

        g_u_rows = g * dv                          # [d, bs]
        g_v_rows = g * eu
        grad_u = scatter(g_u_rows, oh_u)           # [d, n]
        grad_v = scatter(g_v_rows, oh_d)           # [d, m]

        # torch-Adam with coupled weight decay.  Every executed batch holds
        # at least one valid row by construction, so no empty-batch gating.
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


@functools.partial(
    jax.jit,
    static_argnames=("pack", "b1", "b2", "eps", "interpret", "chunk_batches"),
)
def pallas_train_epoch(
    state: EpochState,
    stream,            # tuple of [R, B, bs] arrays; layout set by ``pack``
    lr, wd, step0,     # [R] f32 (step0 = Adam step count before this epoch)
    count,             # [R] int32 valid-row counts
    pack: tuple = ("none", 0, 0, 0, 1),
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    chunk_batches: int | None = None,
):
    """One full training epoch per run, fused into a single TPU kernel.

    Grid dimension = runs; each grid step trains one run's epoch entirely
    in VMEM.  ``stream`` carries the shuffled batch rows in the layout
    described by ``pack = (mode, bits_n, bits_m, bits_z, label_denom)``
    (see :func:`mfcd_tpu.train.pallas_trainer._pack_spec`):
    ``("none", ...)`` -> ``(pu, pi, pj, z)`` four plain arrays;
    ``("uij", ...)`` -> ``(packed_uij, z)``; ``("full", ...)`` -> one
    packed int32 array.  Packed rows are unpacked in-registers inside the
    kernel, so no unpacked batch tensors ever touch HBM.
    Returns (new_state, per-run epoch mean loss [R]).
    """
    r, d, n = state.u_t.shape
    m = state.v_t.shape[2]
    stream = tuple(stream)
    num_batches = stream[0].shape[1]
    bs = stream[0].shape[2]
    # Chunk the batch axis so the streamed blocks fit VMEM alongside the
    # resident state: ~512KB per array per chunk (x2 for pipelining).
    # ``chunk_batches`` overrides the heuristic (envelope-probe script).
    chunk = chunk_batches or max(1, min(num_batches, (512 * 1024) // (bs * 4)))
    n_chunks = -(-num_batches // chunk)
    pad_b = n_chunks * chunk - num_batches
    if pad_b:
        stream = tuple(
            jnp.pad(a, ((0, 0), (0, pad_b), (0, 0))) for a in stream)

    state_spec_n = pl.BlockSpec((1, d, n), lambda i, c: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    state_spec_m = pl.BlockSpec((1, d, m), lambda i, c: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    batch_spec = pl.BlockSpec((1, chunk, bs), lambda i, c: (i, c, 0),
                              memory_space=pltpu.VMEM)
    # Scalars live as full [R, 1] SMEM blocks shared by every grid step
    # (per-program (1, 1) blocks don't satisfy Mosaic's tiling rules);
    # the kernel indexes them with program_id.
    scalar_spec = pl.BlockSpec((r, 1), lambda i, c: (0, 0),
                               memory_space=pltpu.SMEM)

    kernel = functools.partial(_epoch_kernel, b1=b1, b2=b2, eps=eps,
                               pack=pack)
    n_stream = len(stream)
    state_base = 4 + n_stream  # scalars + stream refs precede the state

    out = pl.pallas_call(
        kernel,
        grid=(r, n_chunks),
        in_specs=[
            scalar_spec, scalar_spec, scalar_spec, scalar_spec,
            *([batch_spec] * n_stream),
            state_spec_n, state_spec_m,
            state_spec_n, state_spec_n, state_spec_m, state_spec_m,
        ],
        out_specs=[
            state_spec_n, state_spec_m,
            state_spec_n, state_spec_n, state_spec_m, state_spec_m,
            scalar_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d, n), _F32),
            jax.ShapeDtypeStruct((r, d, m), _F32),
            jax.ShapeDtypeStruct((r, d, n), _F32),
            jax.ShapeDtypeStruct((r, d, n), _F32),
            jax.ShapeDtypeStruct((r, d, m), _F32),
            jax.ShapeDtypeStruct((r, d, m), _F32),
            jax.ShapeDtypeStruct((r, 1), _F32),
        ],
        input_output_aliases={state_base + k: k for k in range(6)},
        interpret=interpret,
    )(
        lr.reshape(r, 1), wd.reshape(r, 1), step0.reshape(r, 1),
        count.astype(jnp.int32).reshape(r, 1),
        *stream,
        state.u_t, state.v_t,
        state.mu_u, state.nu_u, state.mu_v, state.nu_v,
    )
    new_state = EpochState(*out[:6])
    return new_state, out[6][:, 0]


def pallas_epoch_supported(n: int, m: int, d: int, num_batches: int,
                           batch_size: int) -> bool:
    """Conservative VMEM-fit check for the fused epoch kernel.

    The batch tensors stream through VMEM in fixed-size chunks (second grid
    dimension), so only the resident state + one chunk + the one-hot
    working set must fit.
    """
    # Row-count envelope: round-1 observed TPU worker crashes past 2^19
    # rows, but a full probe matrix (scripts/pallas_probe.py: bare kernel,
    # 8-16 streamed chunks, 8-run grids, 30-epoch lax.scan trainer, and the
    # real engine at K=10/p=0.2/n=m=1000 = 2^20 padded rows) reproduces
    # none of them on the current worker — the crash tracked the old
    # libtpu, not this kernel.  The envelope is now set by VMEM fit below;
    # MFCD_PALLAS_MAX_ROWS offers an emergency override.
    import os

    max_rows = int(os.environ.get("MFCD_PALLAS_MAX_ROWS", "0"))
    if max_rows and num_batches * batch_size > max_rows:
        return False

    def padded(rows, cols):
        return ((rows + 7) // 8 * 8) * ((cols + 127) // 128 * 128) * 4

    state_bytes = 3 * (padded(d, n) + padded(d, m))
    stream_bytes = 2 * 4 * 512 * 1024  # 4 arrays x 512KB chunks, x2 buffers
    onehot_bytes = 3 * padded(batch_size, max(n, m))
    # The split-3 one-hot matmuls (_dot3) materialize hi/mid/lo copies of
    # each table operand alongside the original during the dots.
    split_bytes = 3 * (padded(d, n) + padded(d, m))
    total = state_bytes + stream_bytes + onehot_bytes + split_bytes
    return total < 12 * 1024 * 1024  # leave headroom in ~16MB VMEM



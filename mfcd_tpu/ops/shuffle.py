"""Sort-free epoch shuffling — a keyed bijection with cycle walking.

``torch.utils.data.DataLoader(shuffle=True)`` draws a fresh uniform
permutation per epoch (reference ``structure.py:738``).  The direct JAX
translation (``argsort`` of random keys) is runtime-cheap but TPU sorts over
~1e5 elements take *minutes of compile time per shape* — untenable when a
sparsity sweep creates dozens of shapes.  Instead, each epoch uses a keyed
pseudorandom permutation computed pointwise:

- an invertible mixing function on ``[0, 2^k)`` (odd-multiplier, xorshift,
  and add rounds — each a bijection mod 2^k, composed over 3 rounds with
  per-epoch random constants, PCG-style),
- restricted to the dynamic valid prefix ``[0, count)`` by cycle walking:
  iterate the bijection until the value lands below ``count``.  Walking a
  bijection's cycles preserves bijectivity on the sub-domain, so slots
  ``t < count`` map 1:1 onto ``[0, count)``.

The walk uses a fixed 48 iterations; since ``count > 2^(k-1)`` by
construction the failure probability per element is below 2^-48 (any
residual failure falls back to row 0 — a <1e-9 per-epoch chance of one
duplicated sample).  Quality is PRP-grade mixing rather than an exactly
uniform permutation — statistically indistinguishable for SGD shuffling.
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp

_WALK_ITERS = 48


def _derive_constants(key: jax.Array, rounds: int = 3):
    """Per-epoch odd multipliers and additive constants (uint32)."""
    bits = jax.random.bits(key, (2 * rounds,), dtype=jnp.uint32)
    muls = bits[:rounds] | jnp.uint32(1)          # odd -> invertible mod 2^k
    adds = bits[rounds:]
    return muls, adds


def _mix(x: jax.Array, muls, adds, k_bits: int) -> jax.Array:
    """Invertible mixing on [0, 2^k): rounds of mul-odd, xorshift, add."""
    mask = jnp.uint32((1 << k_bits) - 1)
    shift = jnp.uint32(max(k_bits // 2, 1))
    for r in range(muls.shape[0]):
        x = (x * muls[r]) & mask
        x = x ^ (x >> shift)
        x = (x + adds[r]) & mask
    return x


@partial(jax.jit, static_argnames=("k_bits",))
def epoch_permutation(
    key: jax.Array, slots: jax.Array, count, k_bits: int
) -> jax.Array:
    """Map slot indices [N] -> row indices in [0, count), bijectively on
    the prefix ``slots < count``.

    ``count`` may be traced (dynamic); ``k_bits`` must satisfy
    ``2^k_bits >= N`` and ``count <= 2^k_bits``.
    """
    muls, adds = _derive_constants(key)
    count_u = jnp.uint32(count)
    x = _mix(slots.astype(jnp.uint32), muls, adds, k_bits)

    # Early-exit walk: typical counts satisfy count > 2^(k-1), so almost
    # every element lands within 1-2 iterations and the loop exits after
    # ~4-6 — far cheaper than a fixed unroll at sweep batch sizes.
    def cond(state):
        it, xv = state
        return (it < _WALK_ITERS) & jnp.any(xv >= count_u)

    def body(state):
        it, xv = state
        xv = jnp.where(xv < count_u, xv, _mix(xv, muls, adds, k_bits))
        return it + 1, xv

    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    # Residual walk failures (only material under severe sampler shortfall,
    # count << 2^k) degrade to a strided scramble instead of a uniform draw.
    fallback = (slots.astype(jnp.uint32) * muls[0]) % jnp.maximum(
        count_u, jnp.uint32(1))
    x = jnp.where(x < count_u, x, fallback)
    return x.astype(jnp.int32)


def _inverse_odd(m: jax.Array) -> jax.Array:
    """Multiplicative inverse of odd ``m`` mod 2^32 (Newton; 5 steps)."""
    v = m
    for _ in range(5):
        v = v * (jnp.uint32(2) - m * v)
    return v


def _unmix(y: jax.Array, muls, adds, k_bits: int) -> jax.Array:
    """Exact inverse of :func:`_mix` on [0, 2^k)."""
    mask = jnp.uint32((1 << k_bits) - 1)
    shift = int(max(k_bits // 2, 1))
    inv_muls = _inverse_odd(muls)
    for r in range(muls.shape[0] - 1, -1, -1):
        y = (y - adds[r]) & mask
        # Invert x ^= x >> s: the top s bits are already correct; each
        # re-application recovers s more bits.
        x = y
        for _ in range(-(-k_bits // shift) - 1):
            x = y ^ (x >> jnp.uint32(shift))
        y = (x * inv_muls[r]) & mask
    return y


@partial(jax.jit, static_argnames=("k_bits",))
def exact_prefix_permutation_inverse(
    key: jax.Array, values: jax.Array, count, k_bits: int
) -> jax.Array:
    """Exact inverse of :func:`exact_prefix_permutation`.

    For ``v < count``, returns the slot ``s < count`` with
    ``exact_prefix_permutation(key, s, count, k_bits) == v`` — the
    backward cycle walk: apply the inverse mixing until the value
    re-enters [0, count).  Lanes with ``values >= count`` are remapped to
    0 first (outputs meaningless, discard).  Enables gather/scatter-free
    "who feeds output slot v" formulations (the PRP sampler's direct
    split assembly).
    """
    muls, adds = _derive_constants(key)
    count_u = jnp.maximum(jnp.uint32(count), jnp.uint32(1))
    v = values.astype(jnp.uint32)
    v = jnp.where(v < count_u, v, jnp.uint32(0))
    x = _unmix(v, muls, adds, k_bits)

    def cond(xv):
        return jnp.any(xv >= count_u)

    def body(xv):
        return jnp.where(xv < count_u, xv, _unmix(xv, muls, adds, k_bits))

    x = jax.lax.while_loop(cond, body, x)
    return x.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k_bits",))
def exact_prefix_permutation(
    key: jax.Array, slots: jax.Array, count, k_bits: int
) -> jax.Array:
    """Exact bijection of ``slots < count`` onto [0, count).

    Same keyed mixing as :func:`epoch_permutation` but the cycle walk runs
    until EVERY lane lands inside the prefix (no iteration cap, no lossy
    fallback): walking a bijection's cycles from a start in [0, count)
    re-enters [0, count) after finitely many steps, so the restriction is
    an exact permutation.  Used where bijectivity is load-bearing (the
    fused dataset split assigns each unique triplet a *distinct* slot);
    expected iterations are ``2^k_bits / count``, a few cheap vector-ALU
    rounds even under severe sampler shortfall.  Lanes with
    ``slots >= count`` are remapped to slot 0 before the walk — a lane
    starting outside the prefix could sit on a cycle that never enters
    it — so their outputs are meaningless and must be discarded by the
    caller.
    """
    muls, adds = _derive_constants(key)
    count_u = jnp.maximum(jnp.uint32(count), jnp.uint32(1))
    s = slots.astype(jnp.uint32)
    s = jnp.where(s < count_u, s, jnp.uint32(0))
    x = _mix(s, muls, adds, k_bits)

    def cond(xv):
        return jnp.any(xv >= count_u)

    def body(xv):
        return jnp.where(xv < count_u, xv, _mix(xv, muls, adds, k_bits))

    x = jax.lax.while_loop(cond, body, x)
    return x.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Carried epoch streams — periodic reshuffle + cheap prefix-preserving mixing
# ---------------------------------------------------------------------------
#
# A fresh PRP gather per epoch costs one full element gather of the row
# stream, and TPU 1D gathers are latency-bound per *index*: at the bench
# shape ([8, 131072] int32) an element gather runs 1155 us/epoch-run while a
# 128-wide tile gather, a prefix rotation (2 doubled-array dynamic slices),
# and conditional rolls each cost 113-131 us (scripts/profile_tilegather.py).
#
# So the trainers carry the *already shuffled* row stream across epochs and
# advance it each epoch with a bijection on the valid prefix [0, count):
#
# - every ``period``-th epoch: a fresh full PRP element gather (exactly the
#   classic reshuffle; ``epoch_permutation`` maps every slot into
#   [0, count), so padding garbage never enters the prefix),
# - intermediate epochs: a prefix rotation by a random rho mod count
#   composed with a PRP permutation of the *full* 128-wide tiles (the
#   partial boundary tile and all padding tiles stay fixed, keeping valid
#   rows compacted at the front for the kernels' ``slots < count`` masks).
#
# Every training row still appears exactly once per epoch (each step is a
# bijection on the prefix).  Batch composition is fully re-randomized every
# ``period`` epochs and tile/offset-scrambled in between — the reshuffle
# cadence of windowed production data loaders rather than torch's
# every-epoch uniform draw; distribution-level parity is pinned by the
# statistical suite (tests/test_reference_parity.py) either way, since even
# the every-epoch path realizes a different permutation than torch's.

_logged_period: int | None = None


def default_reshuffle_period() -> int:
    """Epoch period of full PRP reshuffles (``MFCD_RESHUFFLE_PERIOD``).

    1 = fresh PRP every epoch (classic behavior).  Read at trace time, so
    set it before the first trainer call in a process.  The default (4)
    trades torch's every-epoch uniform draw for one full reshuffle per 4
    epochs with cheap prefix-rotation/tile-PRP mixing in between;
    distribution-level parity under both regimes is pinned by
    ``scripts/validate_reshuffle.py`` (16-rep CI overlap on the real chip)
    and ``tests/test_reference_parity.py``.  The active period is logged
    once per process so sweep artifacts record which shuffle regime
    produced them.
    """
    global _logged_period
    period = max(1, int(os.environ.get("MFCD_RESHUFFLE_PERIOD", "4")))
    if _logged_period != period:
        _logged_period = period
        print(f"mfcd_tpu: reshuffle period = {period} "
              f"({'fresh PRP every epoch' if period == 1 else 'full reshuffle every %d epochs' % period})",
              file=sys.stderr, flush=True)
    return period


def stream_tile_width(batch_size: int) -> int | None:
    """Tile width for the cheap mixing epochs.

    Derived from ``batch_size`` ONLY (its largest power-of-two divisor,
    capped at 128) so it always divides the padded stream length AND is
    independent of how far the arrays were padded — the valid prefix of a
    mixed stream must be a function of (count, keys) alone, never of the
    capacity bucket, or padding would change results
    (tests/test_trainer.py::test_masked_rows_do_not_train, capacity
    bucketing's pad-invariance).  Widths below 8 don't pay for a tile
    pass; return None (rotation-only cheap epochs).
    """
    w = 1
    while batch_size % (w * 2) == 0 and w < 128:
        w *= 2
    return w if w >= 8 else None


def _rotate_prefix(x: jax.Array, rho, count):
    """Cyclically rotate the valid prefix ``x[:count]`` left by ``rho``.

    Implemented as two dynamic slices of the doubled array (no gather).
    Slots >= count receive in-bounds garbage; callers mask by slot index.
    """
    s_len = x.shape[0]
    d = jnp.concatenate([x, x])
    a = jax.lax.dynamic_slice(d, (rho,), (s_len,))
    b = jax.lax.dynamic_slice(d, (s_len + rho - count,), (s_len,))
    s = jnp.arange(s_len, dtype=jnp.int32)
    return jnp.where(s < count - rho, a, b)


def _permute_full_tiles(x: jax.Array, key: jax.Array, count,
                        tile_w: int, t_bits: int):
    """PRP-permute the fully-valid tiles of ``x`` (tile-granularity gather).

    Tiles wholly inside [0, count) are permuted among themselves; the
    partial boundary tile and padding tiles keep their positions, so the
    valid prefix stays compacted.  ``t_bits`` comes from the row-domain
    ``k_bits`` (not the padded tile count) for pad-invariance.
    """
    tiles = x.shape[0] // tile_w
    full = count // tile_w
    t_slots = jnp.arange(tiles, dtype=jnp.int32)
    prp = epoch_permutation(key, t_slots, jnp.maximum(full, 1), t_bits)
    idx = jnp.where(t_slots < full, prp, t_slots)
    return x.reshape(tiles, tile_w)[idx].reshape(x.shape)


def mix_stream(arrays, key: jax.Array, epoch_idx, count, k_bits: int,
               *, period: int, tile_w: int | None):
    """Advance a carried epoch stream by one epoch's bijection.

    ``arrays`` is a tuple of [S] row arrays sharing one layout (the same
    movement is applied to each); valid rows occupy the prefix
    [0, count).  Returns the mixed tuple.  ``period`` and ``tile_w`` are
    static; ``epoch_idx`` and ``count`` may be traced.

    Pad-invariance: for fixed (count, k_bits, tile_w, key), the prefix of
    the result is independent of the arrays' padded length — padding a
    stream further never changes which row lands in which batch slot.
    """
    k_prp, k_rho, k_tile = jax.random.split(key, 3)
    s_len = arrays[0].shape[0]

    def prp_epoch(arrs):
        slots = jnp.arange(s_len, dtype=jnp.int32)
        sel = epoch_permutation(k_prp, slots, count, k_bits)
        return tuple(a[sel] for a in arrs)

    if period == 1:
        return prp_epoch(arrays)

    def cheap_epoch(arrs):
        rho = (jax.random.bits(k_rho, (), jnp.uint32)
               % jnp.uint32(jnp.maximum(count, 1))).astype(jnp.int32)
        out = tuple(_rotate_prefix(a, rho, count) for a in arrs)
        if tile_w is not None:
            t_bits = max(k_bits - tile_w.bit_length() + 1, 1)
            out = tuple(
                _permute_full_tiles(a, k_tile, count, tile_w, t_bits)
                for a in out)
        return out

    return jax.lax.cond(
        epoch_idx % period == 0, prp_epoch, cheap_epoch, tuple(arrays))

"""Multi-epoch window kernel vs a pure-jnp oracle (interpret mode on CPU).

The windowed path (ops.kernels.pallas_train_window via
pallas_trainer._train_runs_windowed) runs a whole reshuffle window per
kernel launch: a fresh-PRP epoch followed by in-kernel lane-shear cheap
epochs, with the per-epoch val pass fused in.  These tests pin it against
an eager jnp re-implementation built from the same primitives
(epoch_permutation / window_shear_params / apply_window_shear /
adam_update), so any divergence in the kernel's read pattern, masking,
Adam math, or loss accounting fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams, forward_logits, init_params
from mfcd_tpu.ops.losses import bce_with_logits
from mfcd_tpu.ops.optim import adam_init, adam_update
from mfcd_tpu.ops.shuffle import (apply_window_shear, epoch_permutation,
                                  window_shear_params)
from mfcd_tpu.train import pallas_trainer as PT
from mfcd_tpu.train.trainer import batch_losses

N, M, D = 20, 25, 3
ROWS, VROWS, BS = 100, 40, 32


def _split(key, x, n_rows, count=None):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jax.random.randint(k1, (n_rows,), 0, N).astype(jnp.int32)
    i = jax.random.randint(k2, (n_rows,), 0, M).astype(jnp.int32)
    j = jax.random.randint(k3, (n_rows,), 0, M).astype(jnp.int32)
    j = jnp.where(j == i, (j + 1) % M, j)
    z = jax.random.bernoulli(
        k4, jax.nn.sigmoid(x[u, i] - x[u, j])
    ).astype(jnp.float32)
    count = n_rows if count is None else count
    return LabeledSplit(u, i, j, z, jnp.arange(n_rows) < count,
                        jnp.int32(count))


def window_reference(params, train, val, ekey, lr, wd, batch_size,
                     num_epochs, window):
    """Eager jnp oracle of the windowed trainer for ONE run."""
    rows = train.u.shape[0]
    count = int(train.count)
    nb = -(-rows // batch_size)
    padded = nb * batch_size
    k_bits = max(rows - 1, 1).bit_length()
    num_exec = -(-count // batch_size)

    fields = [jnp.pad(a, (0, padded - rows)) for a in
              (train.u, train.i, train.j, train.z)]
    slots = jnp.arange(padded, dtype=jnp.int32)
    order = slots

    def loss_fn(p, u, i, j, z, mask):
        logits = forward_logits(p, u, i, j)
        losses = bce_with_logits(logits, z)
        cnt = jnp.sum(mask)
        return jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(cnt, 1)

    grad_fn = jax.value_and_grad(loss_fn)
    p, opt = params, adam_init(params)
    tl, vl = [], []
    n_windows = -(-num_epochs // window)
    for w in range(n_windows):
        start = w * window
        kprp = jax.random.split(jax.random.fold_in(ekey, start), 3)[0]
        sel = epoch_permutation(kprp, slots, count, k_bits)
        order = order[sel]
        cumb, offs = window_shear_params(ekey, start, window, count,
                                         batch_size)
        for e in range(min(window, num_epochs - start)):
            eorder = apply_window_shear(order, cumb, offs, e, count,
                                        batch_size)
            loss_sum = 0.0
            for t in range(num_exec):
                idx = eorder[t * batch_size:(t + 1) * batch_size]
                mask = (t * batch_size
                        + jnp.arange(batch_size)) < count
                loss, grads = grad_fn(p, fields[0][idx], fields[1][idx],
                                      fields[2][idx], fields[3][idx], mask)
                p, opt = adam_update(p, grads, opt, lr, wd)
                loss_sum = loss_sum + loss
            tl.append(loss_sum / max(num_exec, 1))
            vl.append(batch_losses(p, val, batch_size)[1])
    return p, jnp.stack(tl), jnp.stack(vl)


def _run_windowed(params_list, trains, vals, ekeys, lrs, wd, num_epochs,
                  window):
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    return PT._train_runs_windowed(
        stack(params_list), stack(trains), stack(vals), jnp.stack(ekeys),
        jnp.asarray(lrs, jnp.float32),
        jnp.full((len(lrs),), wd, jnp.float32),
        batch_size=BS, num_epochs=num_epochs, label_denom=1,
        interpret=True, window=window,
    )


@pytest.mark.parametrize("counts,num_epochs,window", [
    ((ROWS, 70), 5, 3),      # full + masked-tail runs, partial last window
    ((20,), 4, 4),           # count < batch_size: full-tile region empty
    ((ROWS,), 2, 2),         # single window
])
def test_windowed_matches_jnp_oracle(counts, num_epochs, window):
    kx = jax.random.key(2)
    x = jax.random.normal(kx, (N, M))
    params, trains, vals, ekeys, lrs = [], [], [], [], []
    for ri in range(len(counts)):
        kk = jax.random.fold_in(jax.random.key(3), ri)
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        params.append(init_params(k1, N, M, D))
        trains.append(_split(k2, x, ROWS, counts[ri]))
        vals.append(_split(k3, x, VROWS))
        ekeys.append(k4)
        lrs.append(1e-2 + 1e-2 * ri)

    got_params, got_tl, got_vl = _run_windowed(
        params, trains, vals, ekeys, lrs, 1e-3, num_epochs, window)

    for ri in range(len(counts)):
        ref_p, ref_tl, ref_vl = window_reference(
            params[ri], trains[ri], vals[ri], ekeys[ri], lrs[ri], 1e-3,
            BS, num_epochs, window)
        np.testing.assert_allclose(
            np.asarray(got_tl[ri]), np.asarray(ref_tl),
            rtol=2e-4, atol=1e-5, err_msg=f"train losses run {ri}")
        np.testing.assert_allclose(
            np.asarray(got_vl[ri]), np.asarray(ref_vl),
            rtol=2e-4, atol=1e-5, err_msg=f"val losses run {ri}")
        np.testing.assert_allclose(
            np.asarray(got_params.U[ri]), np.asarray(ref_p.U),
            rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_params.V[ri]), np.asarray(ref_p.V),
            rtol=2e-3, atol=1e-4)


def test_windowed_uij_mode_soft_labels(monkeypatch):
    """Soft labels whose numerator doesn't fit the packed word run the
    two-stream "uij" kernel branch; both streams must shear identically."""
    K = 4
    real = PT._pack_spec(N, M, K)
    forced = ("uij", real[1], real[2], 0)
    monkeypatch.setattr(PT, "_pack_spec", lambda *a: forced)
    PT.train_runs_pallas.clear_cache()

    kx = jax.random.key(30)
    x = jax.random.normal(kx, (N, M))
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(31), 5)
    params = init_params(k1, N, M, D)
    base = _split(k2, x, ROWS, 70)
    votes = jax.random.bernoulli(
        k5, jax.nn.sigmoid(x[base.u, base.i] - x[base.u, base.j])[:, None],
        (ROWS, K))
    train = base._replace(z=jnp.mean(votes.astype(jnp.float32), axis=1))
    val = _split(k3, x, VROWS)

    stack1 = lambda t: jax.tree.map(lambda a: a[None], t)
    got_params, got_tl, got_vl = PT._train_runs_windowed(
        stack1(params), stack1(train), stack1(val), k4[None],
        jnp.asarray([1e-2], jnp.float32), jnp.asarray([1e-3], jnp.float32),
        batch_size=BS, num_epochs=5, label_denom=K, interpret=True,
        window=3,
    )
    ref_p, ref_tl, ref_vl = window_reference(
        params, train, val, k4, 1e-2, 1e-3, BS, 5, 3)
    np.testing.assert_allclose(np.asarray(got_tl[0]), np.asarray(ref_tl),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_vl[0]), np.asarray(ref_vl),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_params.U[0]),
                               np.asarray(ref_p.U), rtol=2e-3, atol=1e-4)
    PT.train_runs_pallas.clear_cache()


@pytest.mark.parametrize("count", [96, 100, 20, 33])
def test_window_shear_is_bijective_on_valid_prefix(count):
    """Every cheap epoch's read order must visit each valid row exactly
    once and leave the tail (boundary + padding) fixed."""
    bs = 32
    rows = 128
    arr = jnp.arange(rows, dtype=jnp.int32)
    cumb, offs = window_shear_params(jax.random.key(9), 0, 4, count, bs)
    for e in range(1, 4):
        out = np.asarray(apply_window_shear(arr, cumb, offs, e, count, bs))
        full = (count // bs) * bs
        assert sorted(out[:full].tolist()) == list(range(full)), e
        np.testing.assert_array_equal(out[full:], np.arange(full, rows))


def test_window1_matches_per_epoch_path():
    """window=1 degenerates to a fresh PRP every epoch — the exact
    semantics of the per-epoch kernel path at reshuffle_period=1."""
    kx = jax.random.key(12)
    x = jax.random.normal(kx, (N, M))
    k1, k2, k3, k4 = jax.random.split(jax.random.key(13), 4)
    params = init_params(k1, N, M, D)
    train = _split(k2, x, ROWS, 70)
    val = _split(k3, x, VROWS)

    got = _run_windowed([params], [train], [val], [k4], [1e-2], 1e-3,
                        num_epochs=3, window=1)
    stack1 = lambda t: jax.tree.map(lambda a: a[None], t)
    ref = PT._train_runs_pallas(
        stack1(params), stack1(train), stack1(val), k4[None],
        jnp.asarray([1e-2], jnp.float32), jnp.asarray([1e-3], jnp.float32),
        batch_size=BS, num_epochs=3, label_denom=1, interpret=True,
        reshuffle_period=1,
    )
    for g, r in zip(got, ref):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            g, r)


def test_windowed_path_selection(monkeypatch):
    """The public wrapper routes to the window kernel only when enabled,
    period > 1, pack mode is "full", and the streams fit VMEM."""
    calls = []
    monkeypatch.setattr(
        PT, "_train_runs_windowed",
        lambda *a, **k: calls.append("window") or PT._train_runs_pallas(
            *a, **{**{kk: v for kk, v in k.items() if kk != "window"},
                   "reshuffle_period": k["window"]}))

    kx = jax.random.key(20)
    x = jax.random.normal(kx, (N, M))
    k1, k2, k3, k4 = jax.random.split(jax.random.key(21), 4)
    stack1 = lambda t: jax.tree.map(lambda a: a[None], t)
    args = (stack1(init_params(k1, N, M, D)), stack1(_split(k2, x, ROWS)),
            stack1(_split(k3, x, VROWS)), k4[None],
            jnp.asarray([1e-2], jnp.float32),
            jnp.asarray([1e-3], jnp.float32))

    monkeypatch.setenv("MFCD_MULTIEPOCH", "1")
    PT.train_runs_pallas(*args, batch_size=BS, num_epochs=2,
                         interpret=True, reshuffle_period=4)
    assert calls == ["window"]

    # period=1 and env-off both fall back to the per-epoch path.
    PT.train_runs_pallas(*args, batch_size=BS, num_epochs=2,
                         interpret=True, reshuffle_period=1)
    assert calls == ["window"]
    monkeypatch.setenv("MFCD_MULTIEPOCH", "0")
    PT.train_runs_pallas(*args, batch_size=BS, num_epochs=2,
                         interpret=True, reshuffle_period=4)
    assert calls == ["window"]


def test_engine_windowed_integration(monkeypatch):
    """Full engine (run_config -> _train_bucket_pallas -> window kernel)
    on CPU via MFCD_PALLAS_INTERPRET: the flatten/unflatten, label_denom,
    pow-2 row padding, and metrics wiring all hold on the windowed path,
    and its results stay sane vs the jnp engine on the same config."""
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.core.results import validate_schema
    from mfcd_tpu.sweep.engine import run_config

    calls = []
    orig = PT._train_runs_windowed
    monkeypatch.setattr(
        PT, "_train_runs_windowed",
        lambda *a, **k: calls.append("window") or orig(*a, **k))
    monkeypatch.setenv("MFCD_MULTIEPOCH", "1")
    monkeypatch.setenv("MFCD_PALLAS_INTERPRET", "1")

    cfg = RunConfig(n=24, m=28, d=2, p=0.4, s=3.0, lr=1e-2,
                    weight_decay=1e-5, num_epochs=6, reps=2, K=1)
    res = run_config(cfg, seed=3, use_pallas=True)
    assert calls == ["window"]          # 6 epochs -> 2 window launches
    assert not validate_schema(res)
    tl = np.asarray(res["train_losses"], dtype=np.float64)
    vl = np.asarray(res["val_losses"], dtype=np.float64)
    assert tl.shape == (2, 6) and vl.shape == (2, 6)
    assert np.isfinite(tl).all() and np.isfinite(vl).all()
    assert (tl[:, -1] < tl[:, 0]).all()
    assert all(0.0 <= a <= 1.0 for a in res["accuracy"])

    # Same config through the jnp engine: distribution-level closeness
    # only (the two paths realize different shuffles).
    monkeypatch.setenv("MFCD_MULTIEPOCH", "0")
    ref = run_config(cfg, seed=3, use_pallas=False)
    np.testing.assert_allclose(
        res["gt_accuracy"], ref["gt_accuracy"], atol=1e-6)  # train-free
    assert abs(float(np.mean(res["accuracy"]))
               - float(np.mean(ref["accuracy"]))) < 0.2


def test_engine_windowed_soft_label(monkeypatch):
    """Soft labels through the windowed engine: label_denom=K flows into
    the pack spec, and the in-kernel z = numerator/K reproduces the
    fractional vote means on the train split."""
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.core.results import validate_schema
    from mfcd_tpu.sweep.engine import run_config

    calls = []
    orig = PT._train_runs_windowed
    monkeypatch.setattr(
        PT, "_train_runs_windowed",
        lambda *a, **k: calls.append(k["label_denom"]) or orig(*a, **k))
    monkeypatch.setenv("MFCD_MULTIEPOCH", "1")
    monkeypatch.setenv("MFCD_PALLAS_INTERPRET", "1")

    cfg = RunConfig(n=24, m=28, d=2, p=0.4, s=3.0, lr=1e-2,
                    weight_decay=1e-5, num_epochs=5, reps=2, K=4,
                    soft_label=True)
    res = run_config(cfg, seed=7, use_pallas=True)
    assert calls == [4]
    assert not validate_schema(res)
    tl = np.asarray(res["train_losses"], dtype=np.float64)
    assert tl.shape == (2, 5) and np.isfinite(tl).all()
    assert (tl[:, -1] < tl[:, 0]).all()

"""Training-loop tests (reference ``structure.py:812-878``)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import forward_prob, init_params
from mfcd_tpu.train.trainer import train_model

KEY = jax.random.key(5)
N, M, D = 20, 25, 3


def _make_split(key, x, n_rows, count=None):
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.randint(k1, (n_rows,), 0, N)
    i = jax.random.randint(k2, (n_rows,), 0, M)
    j = jax.random.randint(k3, (n_rows,), 0, M)
    j = jnp.where(j == i, (j + 1) % M, j)
    z = (x[u, i] > x[u, j]).astype(jnp.float32)  # noiseless labels
    count = n_rows if count is None else count
    return LabeledSplit(
        u=u.astype(jnp.int32), i=i.astype(jnp.int32), j=j.astype(jnp.int32),
        z=z, valid=jnp.arange(n_rows) < count, count=jnp.int32(count),
    )


def test_training_learns_noiseless_preferences():
    kx, kt, kv, ki, ke = jax.random.split(KEY, 5)
    x = jax.random.normal(kx, (N, M))
    train = _make_split(kt, x, 600)
    val = _make_split(kv, x, 100)
    params = init_params(ki, N, M, D)

    params, train_losses, val_losses = train_model(
        params, train, val, ke, lr=5e-2, weight_decay=0.0,
        batch_size=64, num_epochs=20,
    )
    tl = np.asarray(train_losses)
    vl = np.asarray(val_losses)
    assert tl.shape == (20,) and vl.shape == (20,)
    assert np.all(np.isfinite(tl)) and np.all(np.isfinite(vl))
    assert tl[-1] < tl[0] * 0.7  # clear descent

    # Train-set accuracy should be far above chance.
    probs = np.asarray(forward_prob(params, train.u, train.i, train.j))
    acc = np.mean((probs > 0.5) == np.asarray(train.z))
    assert acc > 0.8


def test_masked_rows_do_not_train():
    """Invalid rows must not influence the final parameters."""
    kx, kt, kv, ki, ke = jax.random.split(jax.random.key(9), 5)
    x = jax.random.normal(kx, (N, M))
    base = _make_split(kt, x, 200)
    val = _make_split(kv, x, 64)
    params0 = init_params(ki, N, M, D)

    out_a = train_model(params0, base, val, ke, 1e-2, 1e-5,
                        batch_size=32, num_epochs=3)

    # Same data + 56 garbage rows marked invalid.
    pad = 56
    poisoned = LabeledSplit(
        u=jnp.concatenate([base.u, jnp.zeros(pad, jnp.int32)]),
        i=jnp.concatenate([base.i, jnp.zeros(pad, jnp.int32)]),
        j=jnp.concatenate([base.j, jnp.ones(pad, jnp.int32)]),
        z=jnp.concatenate([base.z, jnp.ones(pad, jnp.float32)]),
        valid=jnp.concatenate([base.valid, jnp.zeros(pad, bool)]),
        count=base.count,
    )
    out_b = train_model(params0, poisoned, val, ke, 1e-2, 1e-5,
                        batch_size=32, num_epochs=3)

    np.testing.assert_allclose(
        np.asarray(out_a[0].U), np.asarray(out_b[0].U), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_a[1]), np.asarray(out_b[1]), rtol=1e-5
    )


def test_epoch_losses_are_batch_mean_of_means():
    """First-epoch val loss must equal an independent masked computation."""
    kx, kt, kv, ki, ke = jax.random.split(jax.random.key(13), 5)
    x = jax.random.normal(kx, (N, M))
    train = _make_split(kt, x, 100)
    val = _make_split(kv, x, 70)  # batch 32 -> 32, 32, 6
    params0 = init_params(ki, N, M, D)
    _, _, val_losses = train_model(params0, train, val, ke, 0.0, 0.0,
                                   batch_size=32, num_epochs=1)
    # lr=0: params unchanged, so val loss is computable from params0.
    uvt = np.asarray(params0.U) @ np.asarray(params0.V).T
    u, i, j = np.asarray(val.u), np.asarray(val.i), np.asarray(val.j)
    z = np.asarray(val.z)
    logits = uvt[u, i] - uvt[u, j]
    probs = 1 / (1 + np.exp(-logits))
    eps = 1e-12
    bce = -(z * np.log(probs + eps) + (1 - z) * np.log(1 - probs + eps))
    expect = np.mean([bce[:32].mean(), bce[32:64].mean(), bce[64:70].mean()])
    np.testing.assert_allclose(float(val_losses[0]), expect, rtol=1e-4)


def test_batch_losses_streams_blocks_exactly():
    """map_batch_blocks restitching: a >1-block split matches a direct
    single-shot computation to float32 ulp (XLA fuses the two graphs
    differently, so reductions may differ in the last bit)."""
    import jax
    import jax.numpy as jnp

    from mfcd_tpu.data.btl import LabeledSplit
    from mfcd_tpu.models.mf import init_params, forward_logits
    from mfcd_tpu.ops.losses import bce_with_logits
    from mfcd_tpu.train import trainer

    n, m, d, rows, bs = 30, 40, 2, 130 * 64 + 17, 64  # 131 batches, 3 blocks
    key = jax.random.key(3)
    params = init_params(key, n, m, d)
    ks = jax.random.split(key, 4)
    u = jax.random.randint(ks[0], (rows,), 0, n)
    i = jax.random.randint(ks[1], (rows,), 0, m)
    j = jax.random.randint(ks[2], (rows,), 0, m)
    z = jax.random.bernoulli(ks[3], 0.5, (rows,)).astype(jnp.float32)
    valid = jnp.arange(rows) < rows - 5
    split = LabeledSplit(u=u, i=i, j=j, z=z, valid=valid,
                         count=jnp.int32(rows - 5))

    per_batch, epoch = trainer.batch_losses(params, split, bs)
    assert per_batch.shape[0] == 131

    # Direct unstreamed oracle.
    pu, pi, pj, pz, pv = trainer._pad_to_batches(split, bs)
    losses = bce_with_logits(forward_logits(params, pu, pi, pj), pz)
    sums = jnp.sum(jnp.where(pv, losses, 0.0), axis=1)
    cnts = jnp.sum(pv, axis=1)
    means = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), 0.0)
    import numpy as np

    np.testing.assert_allclose(np.asarray(per_batch), np.asarray(means),
                               atol=5e-7, rtol=0)
    expect = float(jnp.sum(means) / jnp.maximum(jnp.sum(cnts > 0), 1))
    assert abs(float(epoch) - expect) < 1e-7


def test_no_tile_width_batch_size_falls_back_to_fresh_prp():
    """batch_size without a pow-2 factor >= 8 has no stream tile width;
    the trainer must then reshuffle every epoch (period forced to 1)
    instead of degrading to rotation-only mixing."""
    from mfcd_tpu.ops.shuffle import stream_tile_width

    assert stream_tile_width(20) is None
    kx, kt, kv, ki, ke = jax.random.split(jax.random.key(21), 5)
    x = jax.random.normal(kx, (N, M))
    train = _make_split(kt, x, 200)
    val = _make_split(kv, x, 60)
    params0 = init_params(ki, N, M, D)

    out_default = train_model(params0, train, val, ke, 1e-2, 1e-5,
                              batch_size=20, num_epochs=5)
    out_p1 = train_model(params0, train, val, ke, 1e-2, 1e-5,
                         batch_size=20, num_epochs=5, reshuffle_period=1)
    np.testing.assert_array_equal(np.asarray(out_default[0].U),
                                  np.asarray(out_p1[0].U))
    np.testing.assert_array_equal(np.asarray(out_default[1]),
                                  np.asarray(out_p1[1]))

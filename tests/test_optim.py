"""torch.optim.Adam parity for the coupled-weight-decay update
(reference ``structure.py:364``; SURVEY §7 hard part 2)."""

import numpy as np
import pytest

from mfcd_tpu.ops.optim import adam_init, adam_update

torch = pytest.importorskip("torch")


def test_adam_matches_torch_with_weight_decay():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 3)).astype(np.float32)
    grads = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(12)]
    lr, wd = 1e-2, 1e-3

    # torch reference
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()

    # ours
    params = {"w": p0.copy()}
    state = adam_init(params)
    for g in grads:
        params, state = adam_update(params, {"w": g}, state, lr, wd)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-5, atol=2e-5
    )


def test_adam_zero_grad_still_decays():
    """Coupled wd updates parameters even with zero gradient (dense Adam)."""
    params = {"w": np.ones((4,), np.float32)}
    state = adam_init(params)
    params2, _ = adam_update(
        params, {"w": np.zeros((4,), np.float32)}, state, 1e-2, 1e-2
    )
    assert np.all(np.asarray(params2["w"]) < 1.0)

"""Ground-truth (model-free) oracle paths.

Capability match for ``evaluate_ground_truth`` / ``parameter_scan_ground_truth``
(reference ``structure.py:1154-1269``): generate X, build a test split with
the full sampling/split/top-up pipeline, and evaluate the true matrix on it —
the Bayes-like accuracy ceiling per (s, p, d, K) that Runs.ipynb cells 21/23
sweep and plots overlay as the dashed GT line
(``visualization.py:1240-1253``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List

import jax
import numpy as np

from mfcd_tpu.core import rng
from mfcd_tpu.core.config import RunConfig, normalize_param
from mfcd_tpu.data.btl import btl_label, sample_and_split
from mfcd_tpu.eval.metrics import ground_truth_metrics
from mfcd_tpu.genx import generate_x

def _gt_single_rep(rep_key, s, cfg: RunConfig, t_cap, extra_cap,
                   budget, extra_budget):
    """GT only consumes the labeled TEST split; the train/val label work
    the full engine does is never traced here."""
    streams = rng.rep_streams(rep_key)
    x = generate_x(streams["x_gen"], cfg.n, cfg.m, cfg.d, cfg.generation)
    splits = sample_and_split(
        streams, x, t_cap=t_cap, extra_cap=extra_cap,
        strategy=cfg.strategy, popularity_method=cfg.popularity_method,
        alpha=cfg.alpha, budget=budget, extra_budget=extra_budget,
    )
    test = btl_label(
        streams["labels_test"], x, splits.test, splits.test_count,
        s, cfg.K, soft_label=False,
    )
    return ground_truth_metrics(x, test, cfg.batch_size)


@partial(jax.jit, static_argnames=("cfg", "t_cap", "extra_cap"))
def _gt_config(cfg: RunConfig, cfg_key, s, t_cap: int, extra_cap: int,
               budget, extra_budget):
    keys = rng.rep_keys(cfg_key, cfg.reps)
    return jax.vmap(
        lambda k: _gt_single_rep(k, s, cfg, t_cap, extra_cap,
                                 budget, extra_budget)
    )(keys)


def evaluate_ground_truth(
    n, m, p, d, s, device=None, K=1, reps=1, strategy="random",
    popularity_method="zipf", alpha=1.5, soft_label=False, generation="base",
    seed: int = 0, config_index: int = 0, pad_compiles: bool = True,
):
    """Returns ``(losses, accuracies)`` lists over repetitions
    (reference ``structure.py:1154-1200``).

    ``pad_compiles`` buckets the triplet capacity to powers of two with the
    exact budget traced (see ``sweep.engine.compile_caps``), so GT p-scans
    (Runs.ipynb cell 21) share compiled programs across sparsities.
    """
    cfg = RunConfig(
        n=int(n), m=int(m), d=int(d), p=float(p), s=float(s), K=int(K),
        reps=int(reps), strategy=strategy,
        popularity_method=popularity_method, alpha=float(alpha),
        soft_label=bool(soft_label), generation=generation,
    )
    sh = cfg.shapes()
    if pad_compiles:
        from mfcd_tpu.sweep.engine import compile_caps

        t_cap, extra_cap = compile_caps(cfg)
        # p enters the trace only through the traced budget once capped.
        shape_cfg = dataclasses.replace(cfg, s=0.0, p=0.0)
    else:
        t_cap, extra_cap = sh.num_triplets, sh.extra_test_triplets
        shape_cfg = dataclasses.replace(cfg, s=0.0)
    cfg_key = rng.config_key(jax.random.key(seed), config_index)
    losses, accs = _gt_config(
        shape_cfg, cfg_key, np.float32(cfg.s), t_cap, extra_cap,
        np.int32(sh.num_triplets), np.int32(sh.extra_test_triplets),
    )
    return [float(x) for x in np.asarray(losses)], [
        float(x) for x in np.asarray(accs)
    ]


def parameter_scan_ground_truth(
    n, m, p, d, s, device=None, K=1, linear=False, reps=1, strategy="random",
    popularity_method="zipf", alpha=1.5, soft_label=False, generation="base",
    seed: int = 0,
) -> List[Dict[str, Any]]:
    """GT-only parameter sweep (reference ``structure.py:1203-1269``):
    same grid/linear scaffold, results ``{'gt_loss', 'gt_accuracy'}``."""
    param_dict = {
        "n": n, "m": m, "p": p, "d": d, "s": s, "K": K, "strategy": strategy,
        "popularity_method": popularity_method, "alpha": alpha,
        "soft_label": soft_label, "generation": generation,
    }
    # NB: hand-rolled expansion (not SweepSpec) on purpose — the reference's
    # GT scan silently falls back to a full grid when linear lists are not
    # synchronized instead of raising (``structure.py:1254-1263``).
    param_dict = {k: normalize_param(v) for k, v in param_dict.items()}
    list_params = [v for v in param_dict.values() if isinstance(v, list)]
    synchronized = (
        len(list_params) <= 1
        or all(len(v) == len(list_params[0]) for v in list_params)
    )
    listified = {
        k: (v if isinstance(v, (list, tuple)) else [v])
        for k, v in param_dict.items()
    }

    if linear and synchronized:
        length = len(list_params[0]) if list_params else 1
        param_sets = [
            {k: (v[i] if len(v) > 1 else v[0]) for k, v in listified.items()}
            for i in range(length)
        ]
    else:
        import itertools

        param_sets = [
            dict(zip(listified.keys(), combo))
            for combo in itertools.product(*listified.values())
        ]

    results = []
    for idx, params in enumerate(param_sets):
        gt_loss, gt_accuracy = evaluate_ground_truth(
            **params, reps=reps, seed=seed, config_index=idx
        )
        results.append(
            {
                "params": params,
                "results": {"gt_loss": gt_loss, "gt_accuracy": gt_accuracy},
            }
        )
    return results

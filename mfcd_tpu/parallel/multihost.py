"""Multi-host (DCN) scale-out for sweeps (SURVEY §5.8).

The workload is embarrassingly parallel at the experiment level, so
multi-host scaling needs no custom communication: each process claims a
disjoint slice of the expanded grid and runs it on its local chips; results
merge through the (atomic) pickle protocol or any shared filesystem.

For true global-mesh execution (one ``parameter_scan_fast`` spanning all
hosts' devices), initialize ``jax.distributed`` first and pass
``make_sweep_mesh()`` built from the global device list — the grid axis
then shards across every chip in the job with zero cross-host collectives
in the compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (DCN-coordinated).

    Thin wrapper over ``jax.distributed.initialize`` so callers don't import
    jax internals; arguments default to the standard env-var autodetection.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_param_sets(param_sets: List[Dict[str, Any]],
                     process_id: int, num_processes: int
                     ) -> List[Dict[str, Any]]:
    """The strided slice of a sweep grid owned by one process.

    Striding (rather than contiguous blocks) balances shape buckets across
    hosts, since neighbouring grid points usually share shapes.
    """
    return param_sets[process_id::num_processes]

"""Actor-pool sizing shared by the model-scoring stages.

Ray Data actor pools declared as ``concurrency=(min, max)`` autoscale
within the bounds, but a hard-coded max silently caps throughput on
bigger machines (a ``(1, 8)`` pool uses 25% of a 32-CPU node for a
tokenization-bound scoring stage).  Derive the max from the CLUSTER CPU
count instead — on a multi-node cluster ``ray.cluster_resources()``
already sums every node, so the pool widens with the cluster without a
config change.
"""

from __future__ import annotations


def scoring_pool(concurrency=None) -> tuple[int, int]:
    """``(1, max)`` actor-pool bounds for a CPU-bound scoring stage.

    ``concurrency`` overrides: an int becomes ``(1, int)``, a tuple
    passes through.  Default: one actor per cluster CPU (each scoring
    actor is single-threaded numpy/pyarrow work at ``num_cpus=1``, so
    cpus actors saturate without oversubscribing), floor 1.
    """
    if concurrency is not None:
        if isinstance(concurrency, tuple):
            return concurrency
        return (1, max(1, int(concurrency)))
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return (1, max(1, cpus or 8))

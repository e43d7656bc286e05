"""Empty-block-safe ``Dataset.join`` — the ONE join entry point.

Ray's hash-shuffle operators (join / groupby-aggregate) emit zero-row
blocks with an EMPTY schema for partitions that received no rows, and
map transforms skip empty blocks, so the schema-less blocks survive
into any downstream join.  pyarrow's acero join then fails key
resolution (``ArrowInvalid: No match or multiple matches for key field
reference FieldRef.Name(...)``) in every join partition that happens to
receive only schema-less blocks from one side — a layout-dependent
flake (round-4 driver FAIL on ``distinctive_terms``).  A FULLY empty
side always crashes, measured even when its blocks DO carry a schema:
the join shuffle drops the schema again for zero-row partitions.

:func:`safe_join` makes the hazard structurally impossible instead of
patching call sites one by one:

* both sides are materialized (the join is an all-to-all barrier
  anyway; re-materializing an already-materialized side is metadata-
  only, measured ~10 ms for 2M rows x 32 blocks) and rebuilt from only
  their non-empty blocks — block REFS stay in the object store, only
  metadata touches the driver;
* an empty side never reaches pyarrow — it short-circuits with the
  join-type's algebraic identity (``left_anti`` with empty right =
  left; ``inner``/``left_semi`` with an empty side = empty;
  ``left_outer`` with empty right = left + null-typed right columns,
  which needs the caller-supplied ``right_empty_fill`` types because an
  all-empty shuffle output has NO recoverable schema — measured
  ``ds.schema() is None``).

Every ``Dataset.join`` call in this repo goes through here; a bare
``.join(`` outside this module is a bug (pytest greps for it).
"""
from __future__ import annotations

import pyarrow as pa


def _nonempty_blocks(mat_ds):
    """Rebuild a MATERIALIZED Dataset from only its non-empty blocks.

    Returns ``None`` when every block is empty (an all-empty shuffle
    output carries no schema, so there is nothing to rebuild from).
    Only block METADATA touches the driver — the data refs stay in the
    object store (zero-copy)."""
    import ray.data as rd

    refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    return rd.from_arrow_refs(refs) if refs else None


def _join_partitions(requested: int | None) -> int:
    """Hash-join partition count.  ``None`` → one partition per cluster
    CPU (every partition is an aggregator actor; fewer under-parallelizes
    the per-partition join finalize, more thrashes the scheduler — e.g. a
    16-way join on a 4-CPU test session sits mostly idle).  An explicit
    ``requested`` is still capped by the CPU count for the same reason;
    on a real multi-node cluster pass the node×core product."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or (requested or 4)
    except Exception:
        cpus = requested or 4
    if requested is None:
        return max(2, cpus)
    return max(2, min(requested, cpus))


def _normalize(side):
    """Materialize ``side`` and drop empty blocks; ``None`` stays ``None``
    (call sites may hand in an already-``_nonempty_blocks``-ed result)."""
    if side is None:
        return None
    return _nonempty_blocks(side.materialize())


def _null_padded(left, right_empty_fill: dict):
    """``left_outer`` identity for an empty right side: left plus the
    right's non-key columns as typed all-null arrays."""

    def pad(batch: pa.Table) -> pa.Table:
        for name, typ in right_empty_fill.items():
            batch = batch.append_column(
                name, pa.nulls(batch.num_rows, type=typ))
        return batch

    return left.map_batches(pad, batch_format="pyarrow")


def safe_join(left, right, join_type: str, num_partitions: int | None = None,
              *, on, right_on=None, right_empty_fill: dict | None = None):
    """``left.join(right, ...)`` with both sides normalized and empty
    sides short-circuited (see module docstring).

    ``num_partitions`` takes the same ``None``/int convention as
    :func:`_join_partitions`.  ``right_empty_fill`` maps the right
    side's carried (non-key) column names to pyarrow types; supply it
    at every ``left_outer`` site whose right side can be all-empty, so
    the join still yields left + typed null columns (without it that
    case raises a descriptive ValueError — the right schema is
    unrecoverable).  Returns ``None`` when the result is
    provably empty (callers treat ``None`` as the empty dataset, same
    contract as :func:`_nonempty_blocks`)."""
    lhs = _normalize(left)
    rhs = _normalize(right)
    if join_type == "full_outer" and (lhs is None or rhs is None):
        # a full-outer identity needs BOTH sides' schemas to null-pad;
        # the (single) call site pre-handles its empty sides
        raise ValueError("safe_join: full_outer with an all-empty side — "
                         "handle the empty-side identities at the call site")
    if lhs is None:
        return None
    if rhs is None:
        if join_type == "left_anti":
            return lhs
        if join_type == "left_outer":
            if right_empty_fill is None:
                raise ValueError(
                    "safe_join: left_outer hit an ALL-EMPTY right side, "
                    "whose schema is unrecoverable — pass right_empty_fill "
                    "({column: pyarrow type}) at this call site")
            return _null_padded(lhs, right_empty_fill)
        return None  # inner / left_semi with an empty side
    # the join's own output may again contain schema-less empty blocks;
    # that is fine for map/filter consumers (they skip empty blocks) and
    # any downstream join re-enters here, which normalizes its inputs
    return lhs.join(rhs, join_type, _join_partitions(num_partitions),
                    on=on, right_on=right_on)

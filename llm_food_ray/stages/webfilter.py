"""Web-corpus admission filters: blocklist-style host gating.

Production crawl pipelines gate documents against curated domain
blocklists (UT1, adult/malware lists) BEFORE any per-document compute is
spent.  The match semantic is suffix-hierarchical: blocking
``example.com`` must also block ``cdn.a.example.com`` — matching any
dot-suffix of the host, at label boundaries only (``notexample.com``
must NOT match).  This differs from the per-host quality gate
(``textstats.tier_by_global_quantiles`` + join): the blocklist is an
externally-supplied small set, so the right plan is a broadcast
membership filter, not a join.

No reference analogue (llm-food fetches single user-supplied URLs);
brief-scope training-data operator.
"""

from __future__ import annotations

import pyarrow as pa


def filter_blocked_hosts(ds, host_column: str, *, blocked,
                         max_labels: int = 8, keep_blocked: bool = False):
    """Drop (or with ``keep_blocked`` select) every row whose host has
    ANY dot-suffix in ``blocked``: the host itself, its registrable
    parent domains, up to the bare TLD — so a blocklist entry gates the
    whole subtree under it.

    Scale shape: the blocklist broadcasts ONCE via ``ray.put`` as an
    Arrow string array; the corpus streams through a single
    ``map_batches`` pass of vectorized kernels — ``max_labels``
    iterations of (strip-first-label regex → ``pc.is_in``), no shuffle,
    no per-row Python.  Hosts with more than ``max_labels`` labels are
    still matched on their deepest ``max_labels`` suffix levels (real
    hostnames rarely exceed 5)."""
    import pyarrow.compute as pc

    import ray as _ray

    ref = _ray.put(pa.array(sorted(set(blocked)), pa.string()))

    def filt(batch: pa.Table) -> pa.Table:
        bset = _ray.get(ref)
        h = batch.column(host_column)
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        cur = h
        mask = pc.fill_null(pc.is_in(cur, value_set=bset), False)
        for _ in range(max_labels - 1):
            nxt = pc.replace_substring_regex(
                cur, r"^[^.]*\.", "", max_replacements=1)
            changed = pc.fill_null(pc.not_equal(nxt, cur), False)
            hit = pc.and_(changed,
                          pc.fill_null(pc.is_in(nxt, value_set=bset), False))
            mask = pc.or_(mask, hit)
            cur = nxt
        keep = mask if keep_blocked else pc.invert(mask)
        return batch.filter(keep)

    return ds.map_batches(filt, batch_format="pyarrow")

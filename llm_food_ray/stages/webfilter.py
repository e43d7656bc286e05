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

def parse_robots(ds, host_column: str = "host",
                 text_column: str = "robots_txt", *, agent: str = "*"):
    """robots.txt BODIES → the (host, prefix, allow) rules table that
    :func:`longest_prefix_policy` consumes — the missing first half of
    the crawl-permission pipeline (real crawls fetch robots.txt text,
    not rule tables).

    Group semantics (RFC 9309 §2.2.1): a group is one or more
    consecutive ``User-agent:`` lines followed by rules; the group
    applying to ``agent`` is the EXACT agent match when present, else
    the ``*`` group; rules outside any group are ignored, unknown
    directives skipped, comments (#) stripped, matching
    case-insensitive on directive names and agent tokens.  Empty-path
    ``Disallow:`` (allow-all idiom) emits no rule.

    Scale shape: a pure streaming map — one robots body is a few KB and
    there is one per HOST, not per document; the downstream policy join
    stays the only exchange."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    agent_l = agent.lower()

    def parse_one(body: str) -> list[tuple[str, bool]]:
        rules_star: list[tuple[str, bool]] = []
        rules_exact: list[tuple[str, bool]] = []
        cur_agents: list[str] = []
        in_group_rules = False
        saw_exact = False
        for raw in (body or "").split("\n"):
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if in_group_rules:
                    cur_agents = []
                    in_group_rules = False
                cur_agents.append(val.lower())
                continue
            if key not in ("allow", "disallow"):
                continue
            in_group_rules = True
            if not cur_agents or not val:
                continue
            rule = (val, key == "allow")
            if agent_l in cur_agents:
                saw_exact = True
                rules_exact.append(rule)
            if "*" in cur_agents:
                rules_star.append(rule)
        return rules_exact if saw_exact else rules_star

    def f(b: pa.Table) -> pa.Table:
        hosts, prefixes, allows = [], [], []
        for h, t in zip(b.column(host_column).to_pylist(),
                        b.column(text_column).to_pylist()):
            for prefix, allow in parse_one(t or ""):
                hosts.append(h)
                prefixes.append(prefix)
                allows.append(allow)
        return pa.table({host_column: pa.array(hosts, pa.string()),
                         "prefix": pa.array(prefixes, pa.string()),
                         "allow": pa.array(allows, pa.bool_())})

    return ds.map_batches(f, batch_format="pyarrow")


def parse_sitemaps(ds, host_column: str = "host",
                   text_column: str = "sitemap_xml"):
    """sitemap.xml BODIES → one row per discovered URL with its
    metadata — the crawl-DISCOVERY half that pairs with
    :func:`parse_robots` (permission) and the frontier planners
    (ordering/budget).  Handles ``<urlset>`` leaf sitemaps; a
    ``<sitemapindex>`` body yields (host, loc, kind='sitemap') rows so
    the caller can schedule the nested fetches — no network here.

    Namespace-agnostic (matches on local tag names, the lenient-parser
    convention for real-world sitemaps); missing <lastmod>/<priority>
    yield ''/NULL.  Malformed XML yields zero rows for that body (the
    crawl goes on) rather than failing the task.

    Scale shape: pure streaming map, one body per HOST — the stdlib
    XML parse is C-backed (expat) and bodies are ≤50 MB by spec."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def parse_one(body: str):
        try:
            root = ET.fromstring(body)
        except ET.ParseError:
            return
        kind = ("sitemap" if local(root.tag) == "sitemapindex" else "url")
        want = "sitemap" if kind == "sitemap" else "url"
        for entry in root:
            if local(entry.tag) != want:
                continue
            loc = lastmod = ""
            prio = None
            for f in entry:
                name = local(f.tag)
                val = (f.text or "").strip()
                if name == "loc":
                    loc = val
                elif name == "lastmod":
                    lastmod = val
                elif name == "priority":
                    try:
                        prio = float(val)
                    except ValueError:
                        prio = None
            if loc:
                yield kind, loc, lastmod, prio

    def f(b: pa.Table) -> pa.Table:
        hosts, kinds, locs, mods, prios = [], [], [], [], []
        for h, t in zip(b.column(host_column).to_pylist(),
                        b.column(text_column).to_pylist()):
            for kind, loc, mod, prio in parse_one(t or ""):
                hosts.append(h)
                kinds.append(kind)
                locs.append(loc)
                mods.append(mod)
                prios.append(prio)
        return pa.table({host_column: pa.array(hosts, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "loc": pa.array(locs, pa.string()),
                         "lastmod": pa.array(mods, pa.string()),
                         "priority": pa.array(prios, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")


def longest_prefix_policy(urls, rules, *, url_column: str = "url",
                          host_column: str = "host",
                          path_column: str = "path",
                          default_allow: bool = True,
                          num_buckets: int = 64):
    """robots.txt-style path policy resolution: every URL is decided by
    the LONGEST matching rule prefix among its host's rules (the RFC
    9309 precedence rule — an `Allow: /p/public` overrides a broader
    `Disallow: /p/`), falling back to ``default_allow`` when nothing
    matches.  → (url, allowed, rule) with ``rule`` the winning prefix
    ('' for the default).

    Scale shape: rules are host-scoped, so ONE hash join on host fans
    each URL out to only ITS host's rules (rules-per-host-bounded,
    never corpus × rules); the startswith check runs per candidate row
    (candidates only — the asymptotically small set); the winner per
    URL resolves inside hash(url)-coarse buckets via the sorted
    run-length first-row take; one LEFT OUTER join fills defaults.
    Ties at equal prefix length: Allow wins (RFC 9309 §2.2.2, least
    restrictive rule), then prefix order — deterministic either way."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64
    from .joins import _join_partitions, _nonempty_blocks, safe_join

    import ray.data as rd

    nparts = _join_partitions(16)
    urls_m = _nonempty_blocks(urls.materialize())
    empty = pa.table({url_column: pa.array([], pa.string()),
                      "allowed": pa.array([], pa.bool_()),
                      "rule": pa.array([], pa.string())})
    if urls_m is None:
        return rd.from_arrow(empty)
    rules_m = _nonempty_blocks(rules.materialize())
    if rules_m is None:
        return urls_m.map_batches(
            lambda b: pa.table({
                url_column: b.column(url_column),
                "allowed": pa.array([default_allow] * b.num_rows),
                "rule": pa.array([""] * b.num_rows, pa.string()),
            }), batch_format="pyarrow")

    cand = safe_join(urls_m, rules_m, "inner", nparts, on=(host_column,))

    def match(b: pa.Table) -> pa.Table:
        paths = b.column(path_column).to_pylist()
        prefixes = b.column("prefix").to_pylist()
        # null paths/prefixes match as '' instead of raising (crawl
        # tables carry null paths for bare-host urls)
        keep = pa.array([(p or "").startswith(r or "") for p, r in
                         zip(paths, prefixes)])
        t = b.filter(keep)
        plen = pc.utf8_length(t.column("prefix"))
        return pa.table({url_column: t.column(url_column),
                         "prefix": t.column("prefix"),
                         "allow": t.column("allow"),
                         "plen": pc.cast(plen, pa.int64())})

    matched = (cand.map_batches(match, batch_format="pyarrow")
               ).materialize()
    matched = _nonempty_blocks(matched)
    if matched is None:
        winners = None
    else:
        def bucket(b: pa.Table) -> pa.Table:
            hs = [stable_hash64(u) % num_buckets
                  for u in b.column(url_column).to_pylist()]
            return b.append_column("__pb", pa.array(hs, pa.int64()))

        def resolve(g: pa.Table) -> pa.Table:
            # RFC 9309 §2.2.2: equal-length Allow/Disallow → the least
            # restrictive rule wins, so allow sorts DESCENDING (True
            # first) at equal plen
            order = pc.sort_indices(
                g, sort_keys=[(url_column, "ascending"),
                              ("plen", "descending"),
                              ("allow", "descending"),
                              ("prefix", "ascending")])
            g = g.take(order)
            u = g.column(url_column).to_numpy(zero_copy_only=False)
            first = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            keep = g.take(pa.array(first))
            return pa.table({url_column: keep.column(url_column),
                             "w_allow": keep.column("allow"),
                             "w_rule": keep.column("prefix")})

        winners = (matched.map_batches(bucket, batch_format="pyarrow")
                   .groupby("__pb")
                   .map_groups(resolve, batch_format="pyarrow")
                   ).materialize()
        winners = _nonempty_blocks(winners)

    if winners is None:
        return urls_m.map_batches(
            lambda b: pa.table({
                url_column: b.column(url_column),
                "allowed": pa.array([default_allow] * b.num_rows),
                "rule": pa.array([""] * b.num_rows, pa.string()),
            }), batch_format="pyarrow")

    joined = safe_join(urls_m, winners, "left_outer", nparts,
                       on=(url_column,),
                       right_empty_fill={"w_allow": pa.bool_(),
                                         "w_rule": pa.string()})

    def finish(b: pa.Table) -> pa.Table:
        allow = pc.fill_null(pc.cast(b.column("w_allow"), pa.bool_()),
                             default_allow)
        rule = pc.fill_null(pc.cast(b.column("w_rule"), pa.string()),
                            "")
        return pa.table({url_column: b.column(url_column),
                         "allowed": allow, "rule": rule})

    return joined.map_batches(finish, batch_format="pyarrow")

def politeness_order(ds, host_column: str = "host",
                     url_column: str = "url", *,
                     num_buckets: int = 64):
    """Crawl-frontier politeness scheduling: a deterministic GLOBAL
    fetch order that round-robins across hosts — every host's first
    URL before any host's second, and so on — so no host is hammered
    by consecutive requests however skewed the frontier.  → (url,
    host, host_rank, position).

    Scale shape: within-host ranks come from ONE hash(host) coarse
    exchange (in-bucket sort + run-length arange — the sessionize
    sweep); the global interleave is the distributed row_number
    primitive (``textstats.global_rank``) over a zero-padded packed
    (host_rank, host) key — block summaries + a driver prefix sum over
    BLOCKS, never rows."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64
    from .textstats import global_rank

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(h)) % num_buckets
              for h in b.column(host_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    def rank_in_host(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[(host_column, "ascending"),
                          (url_column, "ascending")])
        g = g.take(order)
        h = g.column(host_column).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        base = np.repeat(starts, np.diff(np.r_[starts, len(h)]))
        rank = (np.arange(len(h)) - base).astype(np.int64)
        # pack (rank, host) into one sortable key for the global pass
        # (vectorized zero-pad: ranks are non-negative)
        rk = pa.array(np.char.zfill(rank.astype("U"), 12))
        hc = pc.cast(g.column(host_column), pa.string())
        if isinstance(hc, pa.ChunkedArray):
            hc = hc.combine_chunks()
        key = pc.binary_join_element_wise(rk, hc, "|")
        return pa.table({url_column: g.column(url_column),
                         host_column: g.column(host_column),
                         "host_rank": pa.array(rank),
                         "__key": key})

    ranked = (ds.map_batches(bucket, batch_format="pyarrow")
                .groupby("__pb")
                .map_groups(rank_in_host, batch_format="pyarrow"))
    out = global_rank(ranked, "__key", tiebreak_column=url_column,
                      rank_column="position")
    return out.map_batches(
        lambda b: b.select([url_column, host_column, "host_rank",
                            "position"]),
        batch_format="pyarrow")

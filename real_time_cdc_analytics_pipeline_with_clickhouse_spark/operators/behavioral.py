"""Behavioral / sequence analytics over engagement events.

ClickHouse ships a family of parametric aggregate functions that the
reference's serving warehouse (clickhouse-init.sql:1-38 declares the
`analytics` database these queries run in) makes available to every
consumer of `analytics.enriched_events`: ``windowFunnel``,
``retention``, ``sequenceMatch`` and ``sequenceCount``.  They are the
signature engagement-analytics surface of a ClickHouse deployment, so
an engine claiming "a user of the reference could switch" needs them.
This module re-expresses each one Spark-first:

- ``funnel_levels``        — ``windowFunnel(window)(ts, c1..ck)``
- ``funnel_conversion``    — the per-level user-count readout
- ``retention_flags``      — ``retention(c1..ck)`` per user
- ``retention_counts``     — the summed cohort readout
- ``sequence_match_chain`` — ``sequenceMatch('(?1).*(?2)...')``
- ``sequence_count_chain`` — ``sequenceCount`` (disjoint, greedy)

Semantics (pinned, oracle-checked): a funnel chain is events
``e1..ek`` with ``step(ei)=i``, NON-DECREASING timestamps, and
``ts_k - ts_1 <= window``.  Ties are well-defined because a chain's
step indices strictly increase, so any non-decreasing-ts witness is
valid regardless of intra-tie ordering.

Execution shape (100 TB stance): ONE shuffle — ``groupBy(user_id)``
with a map-side-combinable ``collect_list`` of (ts, step) pairs over
the step-filtered stream (the filter is pushed to the scan; non-step
events never shuffle).  The per-user scan is then a single
``aggregate`` (fold) over the sorted array, entirely JVM-side inside
whole-stage codegen — no Python, no window-function re-sort, no
self-joins (the naive k-way join is quadratic per user; the fold is
linear).  Per-user state is O(k); per-row transient memory is the
user's step-event array, the same bound ClickHouse's own
windowFunnel/sequenceMatch states carry.  For pathological single
users with millions of step events, pre-aggregate with a coarser
filter or sessionize first — the fold itself never re-materializes
more than the one array Spark already built.

Funnel-level fold (exact, not heuristic): dp[i] holds the MAXIMUM
chain-start timestamp over chains of length i whose last event has
been processed.  Processing in (ts, step) order means any dp entry is
usable by the current event (its chain ended at-or-before now), and
max-start dominates: the window test ``ts - start <= w`` only ever
gets easier as start grows.  Level = longest non-null dp prefix.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "funnel_levels",
    "funnel_conversion",
    "retention_flags",
    "retention_counts",
    "sequence_match_chain",
    "sequence_count_chain",
    "parse_sequence_pattern",
    "sequence_match_pattern",
    "funnel_segment_states",
    "merge_funnel_states",
    "funnel_levels_from_states",
    "sequence_count_segment_states",
    "merge_sequence_count_states",
    "occurrences_from_states",
]


def _step_expr(steps: Sequence[str]) -> Column:
    """Map event_type -> 1-based step index (rows are pre-filtered to
    the step set, so the chain always terminates)."""
    expr = F.lit(None).cast("long")
    for i in reversed(range(len(steps))):
        expr = F.when(F.col("event_type") == steps[i], F.lit(i + 1).cast("long")).otherwise(expr)
    return expr


def _user_step_seqs(
    engagement: DataFrame,
    steps: Sequence[str],
    extra_keys: Sequence[Column] = (),
) -> DataFrame:
    """(user_id, *extra_keys, seq) where seq = sorted
    array<struct<ts,s>> of the user's step events; the isin filter
    prunes at the scan so only funnel-relevant rows ever shuffle.
    The ONE sequence builder shared by the direct fold and the
    segment-state path (extra_keys = the segment key)."""
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct event types, got {list(steps)}")
    evs = engagement.where(
        F.col("event_type").isin(list(steps)) & F.col("event_ts").isNotNull()
    )
    return evs.groupBy(F.col("user_id"), *extra_keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("event_ts").alias("ts"),
                    _step_expr(steps).alias("s"),
                )
            )
        ).alias("seq")
    )


def _dp_update(
    acc: Column,
    x: Column,
    k: int,
    window_us: Optional[int],
    read: Optional[Column] = None,
) -> list[Column]:
    """One event's dp transition — the SINGLE definition of the
    windowFunnel update, shared by the direct fold and the
    segment-state fold so the segmented≡direct invariant can't drift.

    ``read`` (default ``acc``) is where extension SOURCES come from
    while updates land in ``acc`` — the strict_increase path reads the
    state committed before the current timestamp group so same-ts
    events can't chain onto each other."""
    if read is None:
        read = acc
    out = [F.when(x["s"] == 1, F.greatest(acc[0], x["ts"])).otherwise(acc[0])]
    for i in range(2, k + 1):
        prev, cur = read[i - 2], acc[i - 1]
        cond = (x["s"] == i) & prev.isNotNull()
        if window_us is not None:
            cond = cond & ((x["ts"] - prev) <= F.lit(window_us))
        out.append(F.when(cond, F.greatest(cur, prev)).otherwise(cur))
    return out


def _funnel_dp(seq: Column, k: int, window_us: Optional[int]) -> Column:
    """The windowFunnel fold: dp[i-1] = max chain-start ts over chains
    reaching level i (see module docstring for the dominance proof)."""
    init = F.expr(f"array_repeat(CAST(NULL AS BIGINT), {k})")
    return F.aggregate(
        seq, init, lambda acc, x: F.array(*_dp_update(acc, x, k, window_us))
    )


_FUNNEL_MODES = ("strict_increase", "strict_dedup", "strict_order")


def _strict_funnel_dp(
    seq: Column, k: int, window_us: Optional[int], modes: Sequence[str]
) -> Column:
    """The windowFunnel fold under ClickHouse's strict modes.  Pinned
    semantics (scan = sorted (ts, s) order; s=0 rows, present only
    under strict_order, are events matching no condition):

    - ``strict_dedup``   — an event whose condition's level is ALREADY
      reached (dp[s] non-null) stops the search; the level so far is
      final ("a repeating event interrupts further search").
    - ``strict_order``   — once a step-1 event has been seen, any event
      that does not extend a live chain (matches no condition, or its
      predecessor level is empty) stops the search.  Step-1 events
      never interrupt (they restart chains), and a window-failed
      step-s event with a live predecessor does not interrupt either.
    - ``strict_increase`` — chain timestamps must STRICTLY increase:
      extensions read the dp state committed before the current
      timestamp group, so same-ts events cannot chain onto each other
      (on distinct timestamps this equals the base semantics).

    Stop modes never retract dp entries, so dp stays a prefix and the
    level readout is unchanged.  State is
    struct(ts, stopped, com[k], pen[k]): ``pen`` is current, ``com``
    the pre-group commit (tracked only under strict_increase).
    Cross-checked against brute-force chain enumeration in
    tests/test_behavioral.py.

    ``modes`` must already be a SEQUENCE of mode strings — the public
    boundary (``funnel_levels``) owns the bare-string normalization; a
    stray bare string here fails the unknown-modes check loudly (its
    characters are not mode names), never silently."""
    bad = set(modes) - set(_FUNNEL_MODES)
    if bad:
        raise ValueError(f"unknown funnel modes {sorted(bad)}; known: {_FUNNEL_MODES}")
    si = "strict_increase" in modes
    sd = "strict_dedup" in modes
    so = "strict_order" in modes

    def update(acc: Column, x: Column) -> Column:
        rolled = acc["ts"] != x["ts"]
        com = (
            F.when(rolled, acc["pen"]).otherwise(acc["com"]) if si else acc["pen"]
        )
        read = com if si else acc["pen"]
        pen = acc["pen"]
        stop = F.lit(False)
        if sd:
            # x["s"] is 1-based; pen[s-1] = chain already at this level.
            # greatest(s, 1) keeps the index legal on s=0 rows (present
            # under a combined strict_order mode); the s >= 1 conjunct
            # discards the probe's value there.
            lvl = F.element_at(pen, F.greatest(x["s"], F.lit(1)).cast("int"))
            stop = stop | ((x["s"] >= 1) & lvl.isNotNull())
        if so:
            first_seen = pen[0].isNotNull()
            prev_lvl = F.element_at(
                read, F.greatest(x["s"] - 1, F.lit(1)).cast("int")
            )
            extendable = F.when(x["s"] == 1, F.lit(True)).otherwise(
                (x["s"] >= 2) & prev_lvl.isNotNull()
            )
            stop = stop | (first_seen & ~extendable)
        new_pen = F.array(*_dp_update(pen, x, k, window_us, read=read))
        stopped = acc["stopped"] | stop
        return F.struct(
            x["ts"].alias("ts"),
            stopped.alias("stopped"),
            (com if si else F.lit(None).cast("array<bigint>")).alias("com"),
            F.when(acc["stopped"] | stop, acc["pen"]).otherwise(new_pen).alias("pen"),
        )

    nulls = f"array_repeat(CAST(NULL AS BIGINT), {k})"
    init = F.struct(
        F.lit(None).cast("bigint").alias("ts"),
        F.lit(False).alias("stopped"),
        F.expr(nulls).alias("com"),
        F.expr(nulls).alias("pen"),
    )
    return F.aggregate(seq, init, update)["pen"]


def funnel_levels(
    engagement: DataFrame,
    steps: Sequence[str],
    window_s: Optional[int] = 86400,
    modes: Sequence[str] = (),
) -> DataFrame:
    """``windowFunnel`` analog: per user, the deepest funnel level
    reached — the longest ``steps`` prefix completed by a
    non-decreasing-ts event chain spanning at most ``window_s``
    seconds (``None`` = unbounded, the pure sequence form).

    ``modes`` ⊆ {'strict_increase', 'strict_dedup', 'strict_order'}
    mirrors ClickHouse's ``windowFunnel(window, mode, …)`` arguments —
    see ``_strict_funnel_dp`` for the pinned semantics.  Under
    strict_order ALL of the user's events shuffle (non-step events can
    interrupt the search, so they must be observed — the same cost
    ClickHouse pays); every other mode keeps the step-only scan filter.

    Returns (user_id, funnel_level) for every user with at least one
    step event; users whose events never include step 1 report 0.
    """
    if isinstance(modes, str):  # a bare mode string iterates as chars
        modes = (modes,)
    k = len(steps)
    window_us = None if window_s is None else int(window_s) * 1_000_000
    if not modes:
        dp = _funnel_dp(F.col("seq"), k, window_us)
        seqs = _user_step_seqs(engagement, steps)
    else:
        dp = _strict_funnel_dp(F.col("seq"), k, window_us, modes)
        if "strict_order" in modes:
            # all events shuffle (non-step events interrupt), but the
            # output contract stays "users with >= 1 step event" —
            # same cardinality as every other mode
            seqs = _user_all_event_seqs(engagement, steps).where(
                F.exists("seq", lambda x: x["s"] >= 1)
            )
        else:
            seqs = _user_step_seqs(engagement, steps)
    return seqs.select(
        "user_id",
        F.size(F.filter(dp, lambda v: v.isNotNull())).cast("long").alias("funnel_level"),
    )


def _user_all_event_seqs(engagement: DataFrame, steps: Sequence[str]) -> DataFrame:
    """strict_order's sequence builder: every event of the user, with
    s=0 for events matching no funnel condition (they interrupt the
    search but never extend it).  Ties sort (ts, s), so a same-ts
    non-step event is scanned before the step events at that ts."""
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct event types, got {list(steps)}")
    evs = engagement.where(F.col("event_ts").isNotNull())
    return evs.groupBy(F.col("user_id")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("event_ts").alias("ts"),
                    F.coalesce(_step_expr(steps), F.lit(0).cast("long")).alias("s"),
                )
            )
        ).alias("seq")
    )


def funnel_conversion(
    engagement: DataFrame,
    steps: Sequence[str],
    window_s: Optional[int] = 86400,
    modes: Sequence[str] = (),
) -> DataFrame:
    """Per-level conversion readout: for each level 1..k, how many
    users reached AT LEAST that level — levels nobody reached report
    an explicit 0 (the ClickHouse readout shape iterates all k).  The
    second aggregate is over one row per user — negligible next to
    the funnel shuffle."""
    k = len(steps)
    levels = funnel_levels(engagement, steps, window_s, modes)
    lv = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("level")
    return (
        levels.select(F.col("funnel_level"), lv)
        .groupBy("level")
        .agg(
            F.sum(F.when(F.col("funnel_level") >= F.col("level"), 1).otherwise(0))
            .cast("long")
            .alias("users_reached")
        )
    )


def retention_flags(engagement: DataFrame, conds: Sequence[Column]) -> DataFrame:
    """``retention(cond1..condk)`` analog: per user, ``r1`` = any event
    satisfied ``conds[0]``; ``ri`` = r1 AND any event satisfied
    ``conds[i-1]``.  One combinable groupBy — each flag is a
    ``max(CASE)`` partial aggregate, so the shuffle carries k bits per
    (partition, user)."""
    hits = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"_h{i}")
        for i, c in enumerate(conds, start=1)
    ]
    agg = engagement.groupBy("user_id").agg(*hits)
    r1 = F.col("_h1") == 1
    flags = [r1.alias("r1")] + [
        (r1 & (F.col(f"_h{i}") == 1)).alias(f"r{i}") for i in range(2, len(conds) + 1)
    ]
    return agg.select("user_id", *flags)


def retention_counts(flags: DataFrame) -> DataFrame:
    """Cohort readout: one row, ``r{i}_users`` = users with flag i set
    (the ClickHouse ``sum(r[i])`` idiom over the retention array)."""
    k = sum(1 for c in flags.columns if c.startswith("r"))
    return flags.agg(
        *[
            F.sum(F.when(F.col(f"r{i}"), 1).otherwise(0)).cast("long").alias(f"r{i}_users")
            for i in range(1, k + 1)
        ]
    )


def sequence_match_chain(engagement: DataFrame, steps: Sequence[str]) -> DataFrame:
    """``sequenceMatch('(?1).*(?2)...')`` analog for chain patterns:
    per user, TRUE iff the steps occur in order (any gaps, no time
    bound) — exactly ``funnel_levels`` with an unbounded window
    reaching level k."""
    k = len(steps)
    dp = _funnel_dp(F.col("seq"), k, None)
    return _user_step_seqs(engagement, steps).select(
        "user_id",
        dp[k - 1].isNotNull().alias("matched"),
    )


def sequence_count_chain(engagement: DataFrame, steps: Sequence[str]) -> DataFrame:
    """``sequenceCount`` analog: per user, the number of DISJOINT
    in-order occurrences of the step chain, greedily matched in
    (ts, step) scan order.  Greedy earliest-completion is maximal for
    disjoint subsequence occurrences (exchange argument), so this is
    the exact maximum, not a heuristic.

    Fold state is [progress, count]: an event advances progress iff it
    is the next needed step; completing step k books one occurrence
    and resets."""
    k = len(steps)

    def merge(acc: Column, x: Column) -> Column:
        advanced = F.when(x["s"] == acc[0] + 1, acc[0] + 1).otherwise(acc[0])
        done = advanced == k
        return F.array(
            F.when(done, F.lit(0).cast("long")).otherwise(advanced),
            acc[1] + F.when(done, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
        )

    init = F.expr("array(CAST(0 AS BIGINT), CAST(0 AS BIGINT))")
    fold = F.aggregate(F.col("seq"), init, merge)
    return _user_step_seqs(engagement, steps).select(
        "user_id", fold[1].alias("occurrences")
    )


_PATTERN_TOKEN = __import__("re").compile(
    r"\(\?(\d+)\)|\(\?t\s*(<=|>=|<|>|==)\s*(\d+)\)|\.\*"
)


def parse_sequence_pattern(pattern: str, n_conds: int):
    """Parse the ClickHouse ``sequenceMatch`` mini-language into
    ``(atoms, edges)``: atoms = 1-based condition indices in match
    order; edges[i] describes what may separate atom i and atom i+1 —
    ``{"adjacent": True}`` (no token between → the next
    condition-matching event), ``{"op", "sec"}`` (a ``(?t…)`` time
    bound, any number of events between), or ``{}`` (``.*``, any gap).

    ``==`` parses like the other operators; the evaluator routes
    equality-edged patterns to the candidate-LIST DP (the
    single-candidate dominance DP is exact only for one-sided
    bounds)."""
    atoms: list[int] = []
    edges: list[dict] = []
    pending: dict | None = None
    saw_gap_since_atom = True  # leading .* is irrelevant
    pos = 0
    for m in _PATTERN_TOKEN.finditer(pattern):
        if m.start() != pos:
            raise ValueError(f"bad pattern at {pattern[pos:m.start()]!r}")
        pos = m.end()
        if m.group(1) is not None:
            idx = int(m.group(1))
            if not 1 <= idx <= n_conds:
                raise ValueError(f"(?{idx}) out of range for {n_conds} conditions")
            if atoms:
                if pending is not None:
                    edges.append(pending)
                elif saw_gap_since_atom:
                    edges.append({})
                else:
                    edges.append({"adjacent": True})
            atoms.append(idx)
            pending = None
            saw_gap_since_atom = False
        elif m.group(2) is not None:
            if not atoms:
                raise ValueError("time condition before the first (?N)")
            pending = {"op": m.group(2), "sec": int(m.group(3))}
        else:
            saw_gap_since_atom = True
    if pos != len(pattern.strip()) and pattern[pos:].strip():
        raise ValueError(f"bad pattern at {pattern[pos:]!r}")
    if pending is not None:
        raise ValueError("dangling time condition at pattern end")
    if not atoms:
        raise ValueError("pattern has no (?N) atoms")
    return atoms, edges


def sequence_match_pattern(
    engagement: DataFrame, steps: Sequence[str], pattern: str, cap: int = 64
) -> DataFrame:
    """Full ``sequenceMatch(pattern)(ts, cond1, …)`` analog: per user,
    TRUE iff the user's step events contain a match of ``pattern``,
    where condition N is ``event_type == steps[N-1]``.  Supported
    syntax (the ClickHouse operators): ``(?N)``, ``.*``, direct
    adjacency (``(?1)(?2)`` — the next condition-matching event), and
    ``(?t<n) (?t<=n) (?t>n) (?t>=n) (?t==n)`` time bounds in seconds.
    As in ClickHouse, events matching NO condition are invisible to
    adjacency.

    Exactness: one in-order scan per user (same single-shuffle shape as
    ``funnel_levels``), DP over pattern prefixes keeping ONE candidate
    (ts, position) per prefix.  The kept candidate is chosen by the
    FOLLOWING edge's direction — latest for adjacency/upper bounds
    (a later last-event dominates), earliest for lower bounds — which
    is a sound dominance argument for one-sided constraints, so the
    scan is exact (randomized brute-force cross-check in
    tests/test_behavioral.py).  Atoms may repeat a condition
    (``(?1)(?1)``); an event advances at most one prefix per scan step
    (updates run highest-prefix-first against pre-event state).

    ``(?t==n)`` edges defeat single-candidate dominance (no ordering
    of prefix matches is universally best against an equality), so
    equality-edged patterns route to a candidate-LIST DP: up to
    ``cap`` (ts, idx) prefix matches are retained per atom.  A user
    whose list overflows AND ends unmatched fails LOUDLY
    (``raise_error``) instead of returning a silent false negative —
    a kept candidate that completes is always a real match, so
    matched=True is sound even past the cap."""
    atoms, edges = parse_sequence_pattern(pattern, len(steps))
    if any(e.get("op") == "==" for e in edges):
        return _sequence_match_candidates(engagement, steps, atoms, edges, cap)
    k = len(atoms)

    def keep_late(i: int) -> bool:
        # i = 0-based atom position; policy driven by the edge AFTER it
        if i >= k - 1:
            return True
        e = edges[i]
        return bool(e.get("adjacent")) or e.get("op") in (None, "<", "<=")

    def update(acc: Column, x: Column) -> Column:
        n = acc["n"]  # 0-based index of THIS event in the user's scan
        new_ts, new_idx = [], []
        for i in range(k):  # order irrelevant: all reads are from acc
            cond = x["s"] == atoms[i]
            if i > 0:
                prev_ts, prev_idx = acc["ts"][i - 1], acc["idx"][i - 1]
                cond = cond & prev_ts.isNotNull()
                e = edges[i - 1]
                if e.get("adjacent"):
                    cond = cond & (prev_idx == n - 1)
                elif e.get("op"):
                    gap = x["ts"] - prev_ts
                    bound = F.lit(int(e["sec"]) * 1_000_000)
                    cond = cond & {
                        "<": gap < bound,
                        "<=": gap <= bound,
                        ">": gap > bound,
                        ">=": gap >= bound,
                    }[e["op"]]
            if not keep_late(i):
                cond = cond & acc["ts"][i].isNull()  # keep the earliest
            new_ts.append(F.when(cond, x["ts"]).otherwise(acc["ts"][i]))
            new_idx.append(F.when(cond, n).otherwise(acc["idx"][i]))
        return F.struct(
            (n + 1).alias("n"),
            F.array(*new_ts).alias("ts"),
            F.array(*new_idx).alias("idx"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.expr(f"array_repeat(CAST(NULL AS BIGINT), {k})").alias("ts"),
        F.expr(f"array_repeat(CAST(NULL AS BIGINT), {k})").alias("idx"),
    )
    fold = F.aggregate(F.col("seq"), init, update)
    return _user_step_seqs(engagement, steps).select(
        "user_id", fold["ts"][k - 1].isNotNull().alias("matched")
    )


def _sequence_match_candidates(
    engagement: DataFrame, steps: Sequence[str], atoms, edges, cap: int
) -> DataFrame:
    """Candidate-list evaluator for patterns with ``(?t==n)`` edges
    (see ``sequence_match_pattern``): per atom a bounded list of
    achievable (last-ts, last-idx) prefix matches.  An event matching
    atom i appends one candidate iff SOME candidate of atom i-1
    satisfies the connecting edge (``F.exists`` over the pre-event
    list — the higher-order function runs JVM-side, no UDF).  Lists
    keep their EARLIEST ``cap`` entries; dropping can only lose
    potential matches, so the overflow flag turns an unmatched verdict
    into a loud error rather than ever flipping a matched one."""
    k = len(atoms)
    if cap < 1:
        raise ValueError("cap must be >= 1")

    def update(acc: Column, x: Column) -> Column:
        n = acc["n"]
        over = acc["over"]
        new_lists = []
        for i in range(k):  # all reads from pre-event acc
            lst = acc["c"][i]
            cond = x["s"] == atoms[i]
            if i > 0:
                prev = acc["c"][i - 1]
                e = edges[i - 1]
                if e.get("adjacent"):
                    ok = F.exists(prev, lambda c: c["idx"] == n - 1)
                elif e.get("op"):
                    bound = F.lit(int(e["sec"]) * 1_000_000)
                    op = e["op"]
                    ok = F.exists(
                        prev,
                        lambda c: {
                            "<": (x["ts"] - c["ts"]) < bound,
                            "<=": (x["ts"] - c["ts"]) <= bound,
                            ">": (x["ts"] - c["ts"]) > bound,
                            ">=": (x["ts"] - c["ts"]) >= bound,
                            "==": (x["ts"] - c["ts"]) == bound,
                        }[op],
                    )
                else:
                    ok = F.size(prev) > 0
                cond = cond & ok
            appended = F.concat(
                lst, F.array(F.struct(x["ts"].alias("ts"), n.alias("idx")))
            )
            grown = F.when(cond, appended).otherwise(lst)
            over = over | (F.size(grown) > cap)
            new_lists.append(F.slice(grown, 1, cap))
        return F.struct(
            (n + 1).alias("n"), F.array(*new_lists).alias("c"), over.alias("over")
        )

    empty = "CAST(array() AS ARRAY<STRUCT<ts: BIGINT, idx: BIGINT>>)"
    init = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.expr(f"array_repeat({empty}, {k})").alias("c"),
        F.lit(False).alias("over"),
    )
    fold = F.aggregate(F.col("seq"), init, update)
    matched = F.size(fold["c"][k - 1]) > 0
    loud = F.raise_error(
        F.concat(
            F.lit(
                f"sequence_match_pattern: candidate list overflowed cap={cap} "
                "for user_id="
            ),
            F.col("user_id").cast("string"),
            F.lit(" with no match found — the verdict would be unreliable; raise cap"),
        )
    )
    return _user_step_seqs(engagement, steps).select(
        "user_id",
        F.when(matched, F.lit(True))
        .when(fold["over"], loud.cast("boolean"))
        .otherwise(F.lit(False))
        .alias("matched"),
    )


# ---------------------------------------------------------------------------
# Mergeable funnel states — the 100 TB / streaming path.
#
# ClickHouse's windowFunnel -State is the raw (ts, step) event list, so
# merging two states re-buffers every event.  The summary below is
# O(k^2) per (user, segment) REGARDLESS of event count, and composes
# associatively across time-ordered segments, which buys:
#   - partition-local funnels: scan each month/day partition once,
#     keep (user, segment) summaries, fold — no cross-history rescan;
#   - streaming maintenance: fold each micro-batch's summary into a
#     running per-user state (event-time-ordered batches);
#   - backfill: recompute one day, re-fold — O(days), not O(events).
#
# Summary of a time segment S (events sorted by (ts, step) inside S):
#   dp[i]   = max start-ts over chains reaching level i ENTIRELY in S
#             (window enforced), null if none — same dp as the direct
#             fold;
#   m[j][i] = min last-event-ts over chains of steps j+1..i in S
#             (j < i, no window — the window binds against the start
#             only at composition time), null if none.
#
# Composition A∘B (A strictly earlier in event time than B):
#   dp'[i]   = max( dp_B[i], dp_A[i],
#                   max_{j<i} { dp_A[j] : m_B[j][i] ≤ dp_A[j] + w } )
#   m'[j][i] = min( m_A[j][i],
#                   min_{j≤l<i} { m_B[l][i] : l = j or m_A[j][l] set } )
# Correctness hinges on two facts: the window test only involves a
# chain's START and LAST timestamps (the pinned semantics), and
# max-start dominance is lossless because every later test
# (start >= m - w) is monotone in start.  Cross-segment ordering is
# automatic because segments partition event time.  Both rules are
# associative (m is a min-plus matrix product; dp is the transfer
# applied to it), so any fold shape — left fold, tree reduce — agrees
# with the single-pass fold, proven segmented-≡-direct in tests.
# ---------------------------------------------------------------------------


def _pairs(k: int) -> list[tuple[int, int]]:
    return [(j, i) for j in range(1, k) for i in range(j + 1, k + 1)]


def _pair_idx(k: int) -> dict[tuple[int, int], int]:
    return {p: n for n, p in enumerate(_pairs(k))}


def _segment_fold(seq: Column, k: int, window_us: Optional[int]) -> Column:
    """One pass over a segment's sorted events producing the
    concatenated [dp(k) ++ m(k(k-1)/2)] summary array."""
    idx = _pair_idx(k)
    P = len(idx)

    def merge(acc: Column, x: Column) -> Column:
        out = _dp_update(acc, x, k, window_us)
        for (j, i), p in idx.items():
            cur = acc[k + p]
            if i == j + 1:
                cond = x["s"] == i  # single-event chain
            else:
                cond = (x["s"] == i) & acc[k + idx[(j, i - 1)]].isNotNull()
            out.append(F.when(cond, F.least(cur, x["ts"])).otherwise(cur))
        return F.array(*out)

    init = F.expr(f"array_repeat(CAST(NULL AS BIGINT), {k + P})")
    return F.aggregate(seq, init, merge)


def _compose_states(a: Column, b: Column, k: int, window_us: Optional[int]) -> Column:
    """A∘B for the summary arrays (A earlier in event time)."""
    idx = _pair_idx(k)
    out = []
    for i in range(1, k + 1):
        cands = [b[i - 1], a[i - 1]]
        for j in range(1, i):
            mB = b[k + idx[(j, i)]]
            ok = mB.isNotNull()
            if window_us is not None:
                ok = ok & (mB <= a[j - 1] + F.lit(window_us))
            cands.append(F.when(ok, a[j - 1]))
        out.append(F.greatest(*cands) if len(cands) > 1 else cands[0])
    for (j, i), p in idx.items():
        cands = [a[k + p], b[k + p]]  # l == j: pure-B chain, unconditional
        for l in range(j + 1, i):
            cands.append(F.when(a[k + idx[(j, l)]].isNotNull(), b[k + idx[(l, i)]]))
        out.append(F.least(*cands) if len(cands) > 1 else cands[0])
    return F.array(*out)


def funnel_segment_states(
    engagement: DataFrame,
    steps: Sequence[str],
    window_s: Optional[int] = 86400,
    segment: Optional[Column] = None,
) -> DataFrame:
    """Per-(user, segment) mergeable funnel summary.  ``segment`` must
    be a function of event time that partitions it into ranges (e.g.
    ``date_trunc('day', event_ts)`` or a month partition key) — the
    composition relies on every event of a later segment being no
    earlier than every event of an earlier one.  Defaults to daily.

    At scale this is the map side of the funnel: each time partition
    is scanned once, independently, and emits O(k^2) longs per active
    user — the shuffle carries summaries, never event lists.

    Strict modes are direct-fold only (``funnel_levels(modes=...)``):
    their stop-the-search semantics depend on global scan position, so
    a segment summary can't carry them without also carrying where in
    the segment the stop fired — ClickHouse's own -State form has the
    same coupling (it re-buffers raw event lists)."""
    if segment is None:
        segment = F.date_trunc("day", F.col("event_ts"))
    k = len(steps)
    window_us = None if window_s is None else int(window_s) * 1_000_000
    # segment keys may be timestamps (date_trunc) or numeric partition
    # ids (floor-divided epochs, month keys) — normalize to a long
    seg_ty = engagement.select(segment.alias("_seg")).schema[0].dataType.simpleString()
    seg_key = F.unix_micros(segment) if seg_ty.startswith("timestamp") else segment.cast("long")
    seqs = _user_step_seqs(engagement, steps, extra_keys=(seg_key.alias("segment_us"),))
    return seqs.select(
        "user_id",
        "segment_us",
        _segment_fold(F.col("seq"), k, window_us).alias("state"),
    )


def merge_funnel_states(
    states: DataFrame,
    steps: Sequence[str],
    window_s: Optional[int] = 86400,
) -> DataFrame:
    """Fold (user_id, segment_us, state) rows into one state per user,
    composing in segment order.  One combinable groupBy; the fold is
    over the per-user SEGMENT COUNT (days/months), not events."""
    k = len(steps)
    P = len(_pairs(k))
    window_us = None if window_s is None else int(window_s) * 1_000_000
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("segment_us").alias("seg"), F.col("state").alias("st")))
    )
    init = F.expr(f"array_repeat(CAST(NULL AS BIGINT), {k + P})")
    fold = F.aggregate(
        ordered, init, lambda acc, x: _compose_states(acc, x["st"], k, window_us)
    )
    return states.groupBy("user_id").agg(fold.alias("state"))


def funnel_levels_from_states(merged: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Read the funnel level out of a merged state — the longest
    non-null dp prefix (dp is the first k slots)."""
    k = len(steps)
    dp = F.slice(F.col("state"), 1, k)
    return merged.select(
        "user_id",
        F.size(F.filter(dp, lambda v: v.isNotNull())).cast("long").alias("funnel_level"),
    )


# ---------------------------------------------------------------------------
# Mergeable sequence-count states.
#
# The greedy disjoint-occurrence scan (sequence_count_chain) also
# composes across time-ordered segments: a segment's effect is fully
# described by its TRANSFER FUNCTION — for each possible incoming
# progress p ∈ 0..k-1, the (outgoing progress, completed count) the
# greedy scan produces when entering the segment at p.  That is 2k
# longs per (user, segment); composition is function composition with
# count addition, trivially associative.  Greedy state is a single
# progress value, so tracking all k entry points exactly captures any
# prefix's effect — unlike the funnel dp there is no dominance
# argument needed, this is exhaustive over the k possible hand-offs.
# ---------------------------------------------------------------------------


def sequence_count_segment_states(
    engagement: DataFrame,
    steps: Sequence[str],
    segment: Optional[Column] = None,
) -> DataFrame:
    """Per-(user, segment) transfer function of the greedy disjoint
    sequence count: state[2p] = progress after the segment when
    entering at progress p, state[2p+1] = occurrences completed inside
    the segment from that entry."""
    if segment is None:
        segment = F.date_trunc("day", F.col("event_ts"))
    k = len(steps)
    seg_ty = engagement.select(segment.alias("_seg")).schema[0].dataType.simpleString()
    seg_key = F.unix_micros(segment) if seg_ty.startswith("timestamp") else segment.cast("long")
    seqs = _user_step_seqs(engagement, steps, extra_keys=(seg_key.alias("segment_us"),))

    def merge(acc: Column, x: Column) -> Column:
        out = []
        for p in range(k):
            prog, cnt = acc[2 * p], acc[2 * p + 1]
            advanced = F.when(x["s"] == prog + 1, prog + 1).otherwise(prog)
            done = advanced == k
            out.append(F.when(done, F.lit(0).cast("long")).otherwise(advanced))
            out.append(cnt + F.when(done, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")))
        return F.array(*out)

    init = F.array(
        *[
            c
            for p in range(k)
            for c in (F.lit(p).cast("long"), F.lit(0).cast("long"))
        ]
    )
    fold = F.aggregate(F.col("seq"), init, merge)
    return seqs.select("user_id", "segment_us", fold.alias("state"))


def _compose_seq_states(a: Column, b: Column, k: int) -> Column:
    """A∘B: route each entry progress through A, then hand A's exit
    progress to B (element_at is 1-based; progress indexes pairs)."""
    out = []
    for p in range(k):
        pa, ca = a[2 * p], a[2 * p + 1]
        pb = F.element_at(b, (pa * 2 + 1).cast("int"))
        cb = F.element_at(b, (pa * 2 + 2).cast("int"))
        out.append(pb)
        out.append(ca + cb)
    return F.array(*out)


def merge_sequence_count_states(states: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Fold per-segment transfer functions in segment order; the
    per-user count is entry-progress-0's count, read with
    ``occurrences_from_states``."""
    k = len(steps)
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("segment_us").alias("seg"), F.col("state").alias("st")))
    )
    init = F.array(
        *[
            c
            for p in range(k)
            for c in (F.lit(p).cast("long"), F.lit(0).cast("long"))
        ]
    )
    fold = F.aggregate(ordered, init, lambda acc, x: _compose_seq_states(acc, x["st"], k))
    return states.groupBy("user_id").agg(fold.alias("state"))


def occurrences_from_states(merged: DataFrame) -> DataFrame:
    """Occurrences for the real scan = the entry-progress-0 track."""
    return merged.select("user_id", F.col("state")[1].alias("occurrences"))

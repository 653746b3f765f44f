"""Scalar column expressions — the engine's "UDF surface".

Everything here is a native Catalyst expression (whole-stage codegen,
no Python in the hot path), per SURVEY.md §2.10: the reference's only
scalar functions (timestamp parse, engagement score, hash fallback) are
all expressible as built-ins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def engagement_base_score(event_type: Column) -> Column:
    """CASE base score per event type.

    Reference: ESJ:320-330 scores play/pause/finish/click; the driver
    workload's categories map as view→1.0, signup→0.5, purchase→3.0,
    click→0.2, else 1.0 (same CASE shape, else-branch included).
    """
    et = F.lower(event_type)
    return (
        F.when(et == "view", 1.0)
        .when(et == "signup", 0.5)
        .when(et == "purchase", 3.0)
        .when(et == "click", 0.2)
        .otherwise(1.0)
    )


def engagement_score(event_type: Column, duration_ms: Column) -> Column:
    """base × min(2.5, ln(duration_s + 1)) when duration>0, 2dp round.

    Reference: ESJ:320-337 (the ``Math.min(2.5, Math.log(...))``
    duration multiplier and 2-decimal round).
    """
    dur_s = duration_ms.cast("double") / 1000.0
    mult = F.when(duration_ms > 0, F.least(F.lit(2.5), F.log(dur_s + 1))).otherwise(1.0)
    return F.round(engagement_base_score(event_type) * mult, 2)


def engagement_seconds(duration_ms: Column) -> Column:
    """ESJ:292-294 — duration/1000 as seconds (null passes through)."""
    return duration_ms.cast("double") / 1000.0


def engagement_pct(duration_ms: Column, length_seconds: Column) -> Column:
    """ESJ:296-301 — percent of content consumed, 2dp, guarded."""
    pct = (duration_ms.cast("double") / 1000.0) / length_seconds.cast("double") * 10000.0
    return F.when(
        (length_seconds > 0) & duration_ms.isNotNull(), F.round(pct, 0) / 100.0
    )


def surrogate_event_key(event_id: Column) -> Column:
    """String event_id → stable numeric key (ESJ:521-529, P10).

    The reference tries ``Long.parseLong`` and falls back to
    ``Math.abs(String.hashCode())``.  Java's hashCode isn't
    bit-reproducible in Spark builtins; we keep the same *semantics*
    (parse when numeric, stable hash otherwise) with ``xxhash64``.
    """
    # xxhash64(NULL) yields the seed (42), not NULL — guard explicitly
    # so a missing id stays SQL NULL as in the reference (ESJ:528).
    return F.when(
        event_id.isNotNull(),
        F.coalesce(event_id.try_cast("long"), F.abs(F.xxhash64(event_id))),
    )


HASH_MODES = ("md5", "xxh64")


def portable_hash64(col: Column, seed: str = "", mode: str = "md5") -> Column:
    """Deterministic 60-bit non-negative hash, in one of two modes.

    ``mode="md5"`` (default) is computable identically in DuckDB —
    the ORACLE mode every gated/twinned path uses:

    Spark:  ``conv(substr(md5(seed||x), 1, 15), 16, 10)::long``
    DuckDB: ``('0x' || substr(md5(seed||x), 1, 15))::BIGINT``

    ``mode="xxh64"`` is the PRODUCTION mode: Spark's native
    ``xxhash64`` (codegen'd, no hex round-trip — md5 is a first-order
    CPU cost on hash-bound operators like the feature-hash embedder
    and DSIR featurization).  Same contract — 60-bit non-negative
    range (``shiftrightunsigned`` by 4 drops to 60 bits, so ``% d``
    consumers never see a negative), NULL in → NULL out (xxhash64
    alone would hash the seed for a NULL input) — so the two modes are
    drop-in swaps that change VALUES, never geometry.  No DuckDB twin:
    xxh-mode paths are invariant-tested, not value-twinned.
    """
    if mode == "md5":
        payload = F.concat(F.lit(seed), col) if seed else col
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    if mode == "xxh64":
        h = F.xxhash64(F.lit(seed), col) if seed else F.xxhash64(col)
        return F.when(col.isNotNull(), F.shiftrightunsigned(h, 4))
    raise ValueError(f"unknown hash mode {mode!r}; expected one of {HASH_MODES}")


def json_int(col: Column, path: str) -> Column:
    """P15 — ``get_json_object`` access into the props/raw_payload blob."""
    return F.get_json_object(col, path).cast("long")


# --- MinHash permutation family (shared with the DuckDB oracle) -------------

MINHASH_P = 1073741789  # largest prime below 2^30: products stay < 2^60


def minhash_perm_consts(i: int) -> tuple[int, int]:
    """(a_i, b_i) of the i-th universal-hash permutation
    ``(a_i * h + b_i) mod MINHASH_P``.  Derived from fixed multipliers
    so Spark and the oracle SQL generate the identical family."""
    return (2654435761 * (i + 1)) % MINHASH_P, (40503 * i) % MINHASH_P


def minhash_base(col: Column, mode: str = "md5") -> Column:
    """The shared 30-bit base hash: ONE digest per value (the expensive
    part), reduced mod MINHASH_P; the k permutations are then cheap
    integer affine maps of it — ~k× less hashing than k seeded digests.

    ``mode`` follows the ``portable_hash64`` contract: ``md5`` is the
    DuckDB-twinned oracle family, ``xxh64`` the codegen'd production
    family — same 30-bit range and NULL geometry, different values
    (so signatures from the two modes never mix in one index; the
    LSH-index manifest pins the mode)."""
    return portable_hash64(col, seed="mh:", mode=mode) % MINHASH_P


def minhash_perm(base: Column, i: int) -> Column:
    a, b = minhash_perm_consts(i)
    return (F.lit(a) * base + F.lit(b)) % MINHASH_P

"""Relational operator breadth (SURVEY.md §2 build plan milestone 4).

The reference delegates its warehouse surface to ClickHouse; this
module provides the equivalent query capability over the TPC-H-ish
star schema — joins of every flavor, grouping sets/rollup/cube,
distinct + approximate aggregates, set ops, window functions, top-k.

Implementation note: everything is the plain DataFrame API so Catalyst
owns join selection, pushdown and pruning.  Money aggregates go through
DECIMAL(18,2) (exact; oracle-parity) and are surfaced as doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dec(col, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def money(agg: Column, alias: str) -> Column:
    return agg.cast("double").alias(alias)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: two group cols, 8 aggregates, stable ordering."""
    li = lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum(dec("l_quantity")), "sum_qty"),
            money(F.sum(dec("l_extendedprice")), "sum_base_price"),
            money(F.sum(disc_price), "sum_disc_price"),
            money(F.sum(charge), "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def star_join_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join → revenue per nation.

    Broadcast hints only on the genuinely bounded dims (supplier /
    nation / region).  ``orders`` is fact-proportional (~¼ of lineitem
    rows) and ``customer`` grows with scale factor — both are left to
    AQE, which broadcasts them at small SF and shuffle-joins at 100 TB
    instead of OOMing the driver on a forced broadcast.
    """
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(money(F.sum(revenue), "revenue"), F.count("*").alias("n_items"))
    )


def top_unshipped_orders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: join + group + deterministic top-k."""
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(revenue), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority", "revenue")
    )


def semi_join_customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    return customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def anti_join_parts_never_ordered(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Parts with no shipment in 2001+ (filtered anti-join; the filter
    keeps the result non-trivial on the synthetic data)."""
    recent = lineitem.where(F.col("l_shipdate") >= F.lit("2001-01-01"))
    return part.join(recent, F.col("p_partkey") == F.col("l_partkey"), "left_anti").select(
        "p_partkey", "p_name", "p_type"
    )


def range_join_shipments(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Range (non-equi) join: lineitems shipped within 30 days of the
    order date, counted per order priority.

    Keyed on l_orderkey=o_orderkey first (equi), so Catalyst plans a
    normal hash/sort-merge join and evaluates the range as a post-join
    predicate — the scalable shape (a pure theta-join would be a
    cartesian).
    """
    j = lineitem.join(
        orders,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 30)),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_shipped_30d"),
        money(F.sum(dec("l_extendedprice")), "value_30d"),
    )


def asof_join_latest_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: for each event, the customer's most recent order at
    or before the event time (matching on user_id = o_custkey % 15 to
    give the driver tables a shared key).

    Implemented as the union-ranking idiom: tag both sides, union on
    the time axis, and for each event row take the running latest order
    via a window — one shuffle on (key), no cartesian, scales to any
    fact size (the per-key state is a single running row).
    """
    ev = events.select(
        F.col("event_id"), F.col("user_id").alias("k"), F.col("ts").alias("t"), F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey"), F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = orders.select(
        F.lit(None).cast("long").alias("event_id"), (F.col("o_custkey") % 15).alias("k"),
        F.col("o_orderdate").alias("t"), F.lit(0).alias("is_event"), F.col("o_orderkey"), F.col("o_totalprice"),
    )
    unioned = ev.unionByName(od)
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("t").asc(),
            F.col("is_event").asc(),
            F.col("o_orderkey").asc_nulls_first(),
            F.col("event_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_last = unioned.select(
        "*",
        F.last(F.col("o_orderkey"), ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last(F.col("o_totalprice"), ignorenulls=True).over(w).alias("asof_totalprice"),
    )
    return with_last.where(F.col("is_event") == 1).select(
        "event_id", F.col("k").alias("user_id"), "asof_orderkey", "asof_totalprice"
    )


def asof_join_pandas(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join via cogrouped ``applyInPandas`` + ``pd.merge_asof`` —
    the per-key Arrow-batched alternative to the union-ranking idiom
    (same semantics, tested equivalent).  Scales as one shuffle on the
    key with per-group pandas work; preferable when per-key history
    fits a worker and the pandas ecosystem is already in play.
    """
    import pandas as pd

    ev = events.select(
        "event_id", F.col("user_id").alias("k"), F.col("ts").alias("t")
    )
    od = orders.select(
        (F.col("o_custkey") % 15).alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        "o_orderkey",
        "o_totalprice",
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values(["t", "event_id"])
        # deterministic tie-break: among same-date orders keep max key
        right = right.sort_values(["t", "o_orderkey"])
        out = pd.merge_asof(
            left,
            right.rename(columns={"t": "ot"}),
            left_on="t",
            right_on="ot",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["k_x"] if "k_x" in out else out["k"],
                "asof_orderkey": out["o_orderkey"],
                "asof_totalprice": out["o_totalprice"],
            }
        )

    return (
        ev.groupBy("k")
        .cogroup(od.groupBy("k"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, asof_orderkey long, asof_totalprice double",
        )
    )


def grouping_analytics(spark, lineitem: DataFrame) -> DataFrame:
    """GROUPING SETS with grouping flags (SQL surface — no DataFrame
    API for arbitrary sets).  The set list is a superset of
    ``ROLLUP (l_returnflag, l_linestatus)`` — the (flag, status),
    (flag) and () sets are exactly the rollup lattice — plus the
    (status)-only set, so one query exercises both ROLLUP semantics
    and free-form grouping sets."""
    lineitem.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               count(*) AS cnt
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )


def cube_order_stats(orders: DataFrame) -> DataFrame:
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(money(F.sum(dec("o_totalprice")), "sum_total"), F.count("*").alias("cnt"))
    )


def distinct_stats(lineitem: DataFrame) -> DataFrame:
    """Exact + approximate distinct/quantile aggregates, self-checking.

    HLL++ (``approx_count_distinct``) and ``percentile_approx`` have no
    cross-engine oracle, so the sketches are surfaced as *bounded
    relative-error flags* against the exact aggregates computed in the
    same pass: the oracle asserts the exact columns and that both
    approximations landed within 5% — a hard correctness check that
    never depends on sketch internals.
    """
    exact_median = F.expr("percentile(l_extendedprice, 0.5D)")
    approx_median = F.expr("percentile_approx(l_extendedprice, 0.5D)")
    approx_parts = F.approx_count_distinct("l_partkey", rsd=0.02)
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
        (
            F.abs(approx_parts - F.countDistinct("l_partkey"))
            <= F.countDistinct("l_partkey") * 0.05
        ).alias("approx_parts_ok"),
        (F.abs(approx_median - exact_median) <= F.abs(exact_median) * 0.05).alias(
            "approx_median_ok"
        ),
    )


def set_ops_segments(customer: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over derived key sets, tagged."""
    big = customer.where(F.col("c_acctbal") > 5000).select("c_custkey")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    u = big.union(building).distinct().withColumn("op", F.lit("union"))
    i = big.intersect(building).withColumn("op", F.lit("intersect"))
    e = big.exceptAll(building).distinct().withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e)


def window_order_analytics(orders: DataFrame) -> DataFrame:
    """rank / dense_rank / lag / running sum per customer order history."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wrange = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.rank().over(Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))).alias("price_rank"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
        F.sum(dec("o_totalprice")).over(wrange).cast("double").alias("running_spend"),
    )


def window_frame_analytics(orders: DataFrame) -> DataFrame:
    """Window *frame* variants beyond the running-sum basics: bounded
    ROWS moving average, lead, first_value, ntile and percent_rank —
    one pass, one shuffle on the partition key (all five share the
    per-customer sort, so Spark plans a single Window operator chain).

    Money math in DECIMAL before the double cast; percent_rank rounded
    (it divides by n-1, the one float in the pass) — cross-engine
    deterministic with the orderkey tiebreak.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wmove = w.rowsBetween(-2, 0)
    wprice = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        # exact decimal SUM over the frame, divided as double: avg-of-
        # decimal would tie-break .005 differently per engine (HALF_UP
        # vs HALF_EVEN); a /1,/2,/3 division of a 2dp sum can't land on
        # a 4dp rounding boundary, so this is bit-deterministic
        F.round(
            F.sum(dec("o_totalprice")).over(wmove).cast("double")
            / F.count("*").over(wmove),
            4,
        ).alias("moving_avg_3"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.first_value(F.col("o_orderkey")).over(w).alias("first_orderkey"),
        F.ntile(4).over(wprice).alias("price_quartile"),
        F.round(F.percent_rank().over(wprice), 6).alias("price_pct_rank"),
    )


def pivot_event_types(events: DataFrame) -> DataFrame:
    """Pivot event counts per user (fixed pivot values → no extra scan)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["view", "click", "signup", "purchase", "error"])
        .count()
        .na.fill(0)
    )


def correlated_subquery_expensive_parts(part: DataFrame) -> DataFrame:
    """Parts priced above their brand's average (decorrelated by
    Catalyst into an aggregate + join)."""
    brand_avg = part.groupBy(F.col("p_brand").alias("b")).agg(
        (F.sum(dec("p_retailprice")).cast("double") / F.count("*")).alias("brand_avg")
    )
    return (
        part.join(F.broadcast(brand_avg), part.p_brand == brand_avg.b)
        .where(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice", F.round("brand_avg", 6).alias("brand_avg"))
    )


def quantile_conditional_aggs(lineitem: DataFrame) -> DataFrame:
    """Exact percentiles (linear interpolation) + conditional aggregates
    (count_if / filtered sums / bool_or) in one grouped pass."""
    pct = F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D))")
    disc = F.col("l_discount") > 0.05
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.element_at(pct, 1), 6).alias("p25"),
        F.round(F.element_at(pct, 2), 6).alias("p50"),
        F.round(F.element_at(pct, 3), 6).alias("p90"),
        F.count_if(disc).alias("n_discounted"),
        F.sum(F.when(disc, F.col("l_extendedprice").cast("decimal(18,2)")))
        .cast("double")
        .alias("discounted_rev"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.count("*").alias("cnt"),
    )


def array_agg_event_types(events: DataFrame) -> DataFrame:
    """Deterministic array aggregation: sorted distinct event types per
    user (collect_set is unordered — always sort before exposing).

    The raw array stays internal: only the scalar projections (size,
    csv) are returned, because array-typed result columns defeat
    order-insensitive row canonicalization downstream (pandas cannot
    sort/factorize ndarray cells)."""
    types = F.sort_array(F.collect_set("event_type"))
    return events.groupBy("user_id").agg(
        F.size(types).alias("n_types"),
        F.concat_ws(",", types).alias("types_csv"),
    )


def unpivot_event_counts(events: DataFrame) -> DataFrame:
    """Pivot → unpivot round trip: per-user counts widened to columns,
    then melted back with ``stack`` (keeps explicit zero rows)."""
    wide = pivot_event_types(events)
    types = ["view", "click", "signup", "purchase", "error"]
    stack_expr = "stack({n}, {args}) as (event_type, cnt)".format(
        n=len(types), args=", ".join(f"'{t}', `{t}`" for t in types)
    )
    return wide.selectExpr("user_id", stack_expr)


def semi_anti_join_keys(customer: DataFrame, orders: DataFrame, part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """LEFT SEMI + LEFT ANTI join surface in one tagged key list:
    customers having ≥1 order (semi) and parts never shipped since
    2001 (filtered anti)."""
    semi = semi_join_customers_with_orders(customer, orders).select(
        F.col("c_custkey").alias("key"), F.lit("semi").alias("op")
    )
    anti = anti_join_parts_never_ordered(part, lineitem).select(
        F.col("p_partkey").alias("key"), F.lit("anti").alias("op")
    )
    return semi.unionByName(anti)


def having_large_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """GROUP BY + HAVING via join (TPC-H Q18 shape)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("total_qty_dec"))
        .where(F.col("total_qty_dec") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
    )


def limit_by(
    df: DataFrame, keys: list[str], n: int, order_by: list[Column], offset: int = 0
) -> DataFrame:
    """ClickHouse ``LIMIT [offset,] n BY keys`` — the first ``n`` rows
    per key group (after ``order_by``, ties broken deterministically by
    the caller's ordering), optionally skipping ``offset`` rows first.
    Spark has no SQL surface for this; the idiom is a ranked window +
    filter, which AQE executes as one shuffle on ``keys`` with the sort
    local to each group — per-group top-k never sees a global sort.
    """
    if n <= 0 or offset < 0:
        raise ValueError("need n > 0 and offset >= 0")
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") > offset) & (F.col("_rn") <= offset + n))
        .drop("_rn")
    )

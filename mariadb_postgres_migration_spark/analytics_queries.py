"""General analytics surface: sorts/limits/top-k (SURVEY §2.6), set
operations (§2.7), ranking/analytic windows (§2.5 "not present" list), and
TPC-H-style heavy queries used as bench headliners.

The reference delegates all of this to its source engines; the new engine
owns it. Hash-stability: aggregates of doubles are rounded (accumulation
order differs between engines), orderings that feed a LIMIT always carry a
unique tie-break key, timestamps cross as int64 micros.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register

# --------------------------------------------------------------------------
# TPC-H-style heavies (bench headliners)
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              CAST(count(*) AS BIGINT) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
    "EXT-AGG",
    tier=1,  # r8: consolidated into q16_core_agg_suite (driver row); stays in bench HEADLINE for the frozen series
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide scan → partial+final agg, one shuffle on a
    4-value key. The canonical whole-stage-codegen benchmark."""
    l = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """SELECT o.o_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
              epoch_us(o.o_orderdate) AS o_orderdate_us
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY o.o_orderkey, o.o_orderdate
       ORDER BY revenue DESC, o.o_orderkey
       LIMIT 10""",
    "EXT-TOPK",
    tier=1,  # r8: consolidated into q16_core_agg_suite (driver row); stays in bench HEADLINE for the frozen series
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → two joins → agg → global
    top-10. The LIMIT is pushed through the sort (TakeOrderedAndProject);
    tie-break on o_orderkey keeps the cutoff deterministic across engines."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n.n_name""",
    "EXT-AGG",
    tier=1,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: snowflake join (2 big, 4 dim tables). The dims
    broadcast; only orders⋈lineitem shuffles. Exactly the plan a 100 TB
    run needs — verify no dim ends up on a sort-merge path."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == c.c_nationkey),
        )
        .join(n, c.c_nationkey == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


_Q6_SQL = """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.03 AND 0.07
         AND l_quantity < 24"""


@register("q6_forecast_revenue", _Q6_SQL, "EXT-AGG", tier=1)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+scalar agg — measures predicate
    pushdown and codegen; no shuffle at all (single-row result)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# §2.6 sorts / limits / grouped top-k; §2.5 ranking + analytic windows
# --------------------------------------------------------------------------

@register(
    "w1_topk_per_group",
    """SELECT p_brand, p_partkey, p_retailprice, CAST(rk AS BIGINT) AS rk FROM (
           SELECT p_brand, p_partkey, p_retailprice,
                  row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS rk
           FROM part) WHERE rk <= 3""",
    "EXT-TOPK",
    tier=1,  # r8: consolidated into w4_window_suite (driver row); stays in bench HEADLINE
)
def w1_topk_per_group(spark, sf_dir):
    """Grouped top-k: row_number window + filter — the distributed form of
    per-group ORDER BY/LIMIT; one hash shuffle on the group key, per-
    partition sort, no global sort."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rk"),
        ).filter(F.col("rk") <= 3)
    )


@register(
    "w2_lag_event_gap",
    """SELECT event_id, user_id,
              epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                     ORDER BY event_id) AS gap_us
       FROM events""",
    "EXT-WINDOW",
    tier=1,
)
def w2_lag_event_gap(spark, sf_dir):
    """Analytic lag(): inter-event gap per user — OP-20 is a generalized
    conditional lag; this is the plain form."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    us = F.unix_micros("ts")
    return e.select(
        "event_id", "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )


@register(
    "w3_running_total",
    """SELECT event_id, user_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    2) AS running_value
       FROM events""",
    "EXT-WINDOW",
    tier=1,
)
def w3_running_total(spark, sf_dir):
    """Explicit frame spec: running sum per user. Deterministic accumulation
    order (frame order) so the rounded double matches the oracle exactly."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


@register(
    "s1_global_sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "EXT-TOPK",
    tier=1,
)
def s1_global_sort_limit(spark, sf_dir):
    """Global top-25: planned as TakeOrderedAndProject (per-partition heap +
    driver merge), NOT a full range-shuffle sort — the difference between
    O(k) and O(n) network at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


# --------------------------------------------------------------------------
# §2.7 set operations
# --------------------------------------------------------------------------

_SET1_SQL = """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'"""

_SET2_SQL = """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT
       SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'"""

_SET3_SQL = """SELECT c_custkey AS custkey FROM customer
       EXCEPT
       SELECT o_custkey AS custkey FROM orders"""


@register("set1_union_distinct", _SET1_SQL, "EXT-SET", tier=1)
def set1_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register("set2_intersect", _SET2_SQL, "EXT-SET", tier=1)
def set2_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register("set3_except_anti", _SET3_SQL, "EXT-SET", "OP-05", tier=1)
def set3_except_anti(spark, sf_dir):
    """EXCEPT — also the engine-level formulation of OP-05's
    ``ON CONFLICT DO NOTHING`` (anti-semijoin against sink keys,
    index.mjs:55): customers with no orders."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    # subtract == SQL EXCEPT. The previous exceptAll(distinct).distinct()
    # form diverges when the LEFT side has duplicates: exceptAll removes
    # one occurrence per right row, so a twice-duplicated key with one
    # order survived where EXCEPT excludes it (review r5)
    return c.subtract(o)


# --------------------------------------------------------------------------
# grouping sets / rollup (§2.4 "not present" list — engine surface)
# --------------------------------------------------------------------------

@register(
    "g1_rollup_counts",
    """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "EXT-AGG",
    tier=1,
)
def g1_rollup_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# temporal joins (§2.3 "not present" list — engine surface; see
# operators/joins.py for the scale strategies)
# --------------------------------------------------------------------------

_J1_SQL = """WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
       c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
       m AS (SELECT p.event_id, c.ts AS cts, c.value AS cval,
                    row_number() OVER (PARTITION BY p.event_id
                                       ORDER BY c.ts DESC) AS rk
             FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
       SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
              epoch_us(m.cts) AS click_ts_us, m.cval AS click_value
       FROM p LEFT JOIN (SELECT * FROM m WHERE rk = 1) m USING (event_id)"""


@register("j1_asof_join", _J1_SQL, "EXT-JOIN", tier=1)
def j1_asof_join(spark, sf_dir):
    """As-of join: each purchase gets the user's latest click at-or-before
    it (NULLs when none). Union + single-shuffle window — never an
    inequality join (operators/joins.as_of_join)."""
    from .operators.joins import as_of_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = as_of_join(
        purchases, clicks, ["user_id"], "ts", "ts", ["ts", "value"], suffix="_c"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_c").alias("click_ts_us"),
        F.col("value_c").alias("click_value"),
    )


@register(
    "q4_order_priority_exists",
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
       GROUP BY o.o_orderpriority""",
    "EXT-AGG",
    tier=1,
)
def q4_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join — the probe
    side never duplicates (no distinct needed), and the filter on lineitem
    is pushed below the join."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q13_customer_distribution",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
             FROM customer c LEFT JOIN orders o
               ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
             GROUP BY c.c_custkey)
       GROUP BY c_count""",
    "EXT-AGG",
    tier=1,  # demoted r4: EXT-AGG is covered 10+ times in the window; the
             # slot went to the x42 pipeline-ops suite (extension_queries)
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join preserving customers with no orders,
    then a two-level aggregation. The second groupBy is on a tiny domain —
    AQE coalesces its shuffle to a handful of partitions."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


_Q17_SQL = """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cap
             FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_cap"""


@register("q17_small_quantity_revenue", _Q17_SQL, "EXT-AGG", tier=1)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    per-part aggregate joined back. The per-part avg table is |part|-sized
    → broadcast; lineitem is scanned twice but both scans prune to 3
    columns (at 100 TB prefer one scan + window over l_partkey ONLY if
    lineitem is already partitioned by part — the double scan avoids a full
    sort-shuffle of the fact table)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    caps = l.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        # unhinted (r8): caps is one row per part — grows with the corpus;
        # AQE broadcasts it at runtime only while it fits the threshold
        .join(caps.withColumnRenamed("l_partkey", "cap_partkey"),
              F.col("l_partkey") == F.col("cap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q19_SQL = """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30)"""


@register("q19_disjunctive_predicate_join", _Q19_SQL, "EXT-AGG", tier=1)
def q19_disjunctive_predicate_join(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive predicates across both
    join sides. Catalyst extracts the common join key (equi-join survives)
    and pushes the brand IN-list / quantity range down to the scans as
    partial filters from the OR."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_J2_SQL = """SELECT s.event_id AS signup_id, e.event_id AS event_id,
              e.event_type, epoch_us(e.ts) AS ts_us
       FROM events s JOIN events e
         ON s.user_id = e.user_id
        AND epoch_us(e.ts) >= epoch_us(s.ts) + 1000000
        AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
       WHERE s.event_type = 'signup'"""


@register("j2_interval_join", _J2_SQL, "EXT-JOIN", tier=1)
def j2_interval_join(spark, sf_dir):
    """Interval join: every event within (1s, 1h] after a signup by the
    same user. Bucketed equi-join, not an inequality nested-loop
    (operators/joins.interval_join)."""
    from .operators.joins import interval_join

    e = _t(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("s_ts")
    )
    others = e.select("event_id", "user_id", "event_type", "ts")
    return interval_join(
        signups, others, ["user_id"], "s_ts", "ts", 1.0, 3600.0
    ).select(
        "signup_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


# --------------------------------------------------------------------------
# grouping sets / cube (SURVEY §2.4 "not present" list — engine surface)
# --------------------------------------------------------------------------

@register(
    "g2_cube_counts",
    """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
              round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "EXT-AGG",
    tier=1,
)
def g2_cube_counts(spark, sf_dir):
    """CUBE: all 4 grouping-set combinations in ONE pass — Spark expands
    grouping sets inside the aggregate (Expand node), not as a union of 4
    scans."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "g3_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    "EXT-AGG",
    tier=1,
)
def g3_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (two disjoint rollup dimensions, one scan)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# exact percentiles (SURVEY §2.4 — distribution statistics surface)
# --------------------------------------------------------------------------

@register(
    "p1_percentiles_by_flag",
    """SELECT l_returnflag,
              round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
              round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
              round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
       FROM lineitem GROUP BY l_returnflag""",
    "EXT-AGG",
    tier=1,
)
def p1_percentiles_by_flag(spark, sf_dir):
    """Exact continuous-interpolation percentiles per group, computed
    DISTRIBUTED: Spark's holistic ``percentile`` would route the entire
    fact table to 3 reducers, so instead the p2 histogram pattern
    (partial-agg to (flag, value) counts → cumulative-count window over
    the small histogram) locates the two bracketing order statistics at
    rank ⌊p·(n−1)⌋ and ⌊p·(n−1)⌋+1 and interpolates between them — the
    same value ``quantile_cont`` returns, but every fact-table-sized stage
    is map-side combinable. The t-digest ``approx_percentile`` sketch
    remains the bounded-error fallback when even the value histogram is
    too wide (tests/test_approx.py)."""
    l = _t(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("v")
    wall = Window.partitionBy("l_returnflag")
    hist = counts.select(
        "l_returnflag",
        "v",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def brackets(p: float, tag: str):
        k = F.floor(F.lit(p) * (F.col("n") - 1))
        return [
            F.min(F.when(F.col("cum") >= k + 1, F.col("v"))).alias(f"__lo{tag}"),
            F.min(F.when(F.col("cum") >= k + 2, F.col("v"))).alias(f"__hi{tag}"),
        ]

    agged = hist.groupBy("l_returnflag").agg(
        F.max("n").alias("__n"),
        *brackets(0.25, "25"),
        *brackets(0.50, "50"),
        *brackets(0.75, "75"),
    )

    def interp(p: float, tag: str, name: str):
        rank = F.lit(p) * (F.col("__n") - 1)
        frac = rank - F.floor(rank)
        lo, hi = F.col(f"__lo{tag}"), F.coalesce(f"__hi{tag}", f"__lo{tag}")
        return F.round(lo + frac * (hi - lo), 4).alias(name)

    return agged.select(
        "l_returnflag",
        interp(0.25, "25", "p25"),
        interp(0.50, "50", "p50"),
        interp(0.75, "75", "p75"),
    )


# --------------------------------------------------------------------------
# skew-resistant aggregation (SURVEY §4 100 TB notes — salting)
# --------------------------------------------------------------------------

@register(
    "t1_salted_skew_agg",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              round(sum(value), 2) AS sum_value
       FROM events GROUP BY event_type""",
    "EXT-AGG",
    tier=1,  # r8: consolidated into t2_aggstress_suite (driver row); stays in bench HEADLINE
)
def t1_salted_skew_agg(spark, sf_dir):
    """Two-phase salted aggregation for hot keys: phase 1 aggregates on
    (key, salt) spreading each hot key over 16 reducers, phase 2 merges the
    16 partials per key. On a 5-value key at 100 TB a plain groupBy would
    route everything to 5 reducers; hash partial aggregation already blunts
    that for algebraic aggs — salting is the general form that also covers
    collect_list/percentile-style holistic aggs. Result is key-only, so the
    salt never leaks into the output."""
    e = _t(spark, sf_dir, "events")
    salted = e.withColumn("__salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("psum")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.round(F.sum("psum"), 2).alias("sum_value")
    )


# --------------------------------------------------------------------------
# TPC-H-style breadth: multi-nation flow, returned-items top-k, promo share,
# large-volume orders, idle-customer anti-join
# --------------------------------------------------------------------------

def _decimal_revenue():
    """Exact-decimal l_extendedprice·(1−l_discount): decimal add/multiply is
    associative, so the sum is identical under ANY accumulation order —
    where a double sum over a thousand groups lands on cent-rounding
    boundaries differently per engine. Cast back to double at the edge."""
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )


@register(
    "q7_nation_volume_flow",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       WHERE sn.n_name <> cn.n_name
         AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)""",
    "EXT-AGG", "EXT-JOIN",
    tier=1,  # r7: driver row moved into q15_joins_suite ('q7')
)
def q7_nation_volume_flow(spark, sf_dir):
    """TPC-H Q7 shape: the nation dim joins twice under different roles
    (supplier side / customer side) — both broadcast, so the only shuffles
    are lineitem⋈orders and the final agg. The cross-nation inequality is a
    post-broadcast filter, never a join condition that would force a
    nested loop."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))  # bounded: 25-row nation projection
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))  # bounded: 25-row nation projection
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_decimal_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_item_revenue",
    """SELECT c.c_custkey, c.c_name, n.n_name,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
         AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c_custkey
       LIMIT 20""",
    "EXT-TOPK", "EXT-AGG",
    tier=1,  # r7: driver row moved into q15_joins_suite ('q10')
)
def q10_returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 shape: who cost us the most in returns last quarter.
    Selective filters push to both fact scans; top-20 runs as
    TakeOrderedAndProject (per-partition heap + driver merge of 20-row
    heads, never a global sort). Tie-break on c_custkey keeps the LIMIT
    cutoff deterministic across engines."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))  # bounded: 25-row nation dim
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_decimal_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q14_SQL = """SELECT round(100.0 * sum(CASE WHEN p.p_type = 'ECONOMY'
                                     THEN l.l_extendedprice * (1 - l.l_discount)
                                     ELSE 0 END)
                    / sum(l.l_extendedprice * (1 - l.l_discount)), 3) AS promo_pct
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""


@register("q14_promo_revenue_share", _Q14_SQL, "EXT-AGG", tier=1)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio in one pass — both
    sums share one scan/join, so Catalyst plans a single hash aggregate
    (never two jobs diffed driver-side). part broadcasts."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))
    return (
        # unhinted (r8): part grows with the corpus — size-based planning
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 3).alias("promo_pct"))
    )


@register(
    "q18_large_volume_orders",
    """SELECT c.c_custkey, o.o_orderkey,
              epoch_us(o.o_orderdate) AS o_orderdate_us,
              round(o.o_totalprice, 2) AS o_totalprice,
              round(sum(l.l_quantity), 2) AS sum_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
       HAVING sum(l.l_quantity) > 300""",
    "EXT-AGG",
    tier=1,  # r8: consolidated into t2_aggstress_suite (driver row); stays in bench HEADLINE
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over a fact aggregate. The quantity rollup
    happens BEFORE the customer join — the join input shrinks from every
    lineitem to the handful of qualifying orders, so customer meets a
    few-row broadcast side instead of a fact-sized shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("__qty", 2).alias("sum_qty"),
        )
    )


@register(
    "q22_idle_high_balance",
    """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
              round(sum(c.c_acctbal), 2) AS total_bal
       FROM customer c
       WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                            WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
       GROUP BY c.c_mktsegment""",
    "EXT-AGG", "EXT-SET",
    tier=1,  # r5: demoted to free a window slot for x65_health_suite; its
    # EXT-AGG/EXT-SET tags stay tier-0-covered by q1/set_operations et al.
)
def q22_idle_high_balance(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery (global avg broadcasts as a
    1-row cross join) + anti-join against recent orders — the gone-idle
    high-balance segment. The anti-join's build side is pre-filtered by
    date at the scan; no correlated per-row subquery ever executes."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.join(F.broadcast(avg_bal))  # bounded: 1-row scalar aggregate
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "q21_late_supplier_chain",
    """WITH li AS (SELECT l.l_suppkey, l.l_orderkey,
                         (epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate)
                          + 5184000000000) AS is_late
                  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       per_order AS (SELECT l_orderkey,
                            CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
                            CAST(count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
                                 AS BIGINT) AS n_late_supp
                     FROM li GROUP BY l_orderkey),
       blamed AS (SELECT DISTINCT li.l_suppkey, li.l_orderkey
                  FROM li JOIN per_order p ON li.l_orderkey = p.l_orderkey
                  WHERE li.is_late AND p.n_supp >= 2 AND p.n_late_supp = 1)
       SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
       GROUP BY s.s_name""",
    "EXT-AGG", "EXT-JOIN",
    tier=1,
)
def q21_late_supplier_chain(spark, sf_dir):
    """TPC-H Q21 shape (reshaped to the fixture columns: "late" = shipped
    > 60 days after order date): suppliers who were the SOLE late supplier
    on a multi-supplier order. The classic double-correlated
    EXISTS/NOT-EXISTS decorrelates into ONE per-order aggregate (distinct
    supplier count + distinct late-supplier count) joined back — the whole
    blame assignment costs two shuffles on l_orderkey instead of two
    correlated subqueries per lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    li = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        "l_orderkey",
        (
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            > F.unix_micros(F.col("o_orderdate").cast("timestamp")) + 5_184_000_000_000
        ).alias("is_late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    blamed = (
        li.filter(F.col("is_late"))
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        # unhinted (r8): supplier grows with the corpus
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# TPC-H completion: the six shapes (Q2/Q9/Q11/Q12/Q16/Q20) whose originals
# need a partsupp table the fixture lacks — reshaped onto lineitem as the
# part↔supplier bridge, keeping each query's defining plan challenge
# (correlated min, profit rollup, fraction-of-total HAVING, case-counting
# pivot, distinct-count with NOT-IN exclusion, share-threshold semi-join).
# --------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    """WITH cost AS (SELECT l.l_partkey, l.l_suppkey,
                           min(l.l_extendedprice / l.l_quantity) AS unit_cost
                    FROM lineitem l
                    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
                    WHERE r.r_name = 'EUROPE'
                    GROUP BY l.l_partkey, l.l_suppkey)
       SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
              round(s.s_acctbal, 2) AS s_acctbal, c.unit_cost
       FROM cost c
       JOIN part p ON c.l_partkey = p.p_partkey
       JOIN supplier s ON c.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
         AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                            WHERE c2.l_partkey = c.l_partkey)""",
    "EXT-AGG", "EXT-JOIN",
    tier=1,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (partsupp reshaped to lineitem): for each qualifying
    part, the EUROPE supplier quoting the minimum unit cost. The correlated
    min-subquery decorrelates into a window min over l_partkey on the
    (part, supplier) cost table — computed once, no per-row subquery. Unit
    cost is a single IEEE division and min is exact, so the ``== min``
    predicate is engine-stable (ties surface identically in both engines).
    Dims broadcast; the only big shuffle is the (partkey, suppkey) agg."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    europe_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)  # bounded: 25-row nation dim
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))  # bounded: 5-row region dim
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        # unhinted (r8): europe_supp is supplier-sized — grows with the corpus
        l.join(europe_supp.select("s_suppkey"), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.withColumn(
        "__min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("__min_cost"))
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(europe_supp, best.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "unit_cost",
        )
    )


@register(
    "q9_product_type_profit",
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                AS profit
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE p.p_name LIKE '%gear%'
       GROUP BY n.n_name, year(o.o_orderdate)""",
    "EXT-AGG", "EXT-JOIN",
    tier=1,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year. part filters by name BEFORE the join (predicate at the scan,
    broadcast build side), so lineitem is cut to the matching product line
    in its first join; the orders join carries only the surviving rows.
    Exact decimal sum → engine-stable without rounding."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (
        # unhinted (r8): part/supplier grow with the corpus; only the
        # bounded: 25-row nation keeps its hint
        l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"), l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_decimal_revenue()).cast("double").alias("profit"))
    )


def _q11_part_value(spark, sf_dir):
    """q11's per-part traded-value frame, BEFORE the localCheckpoint that
    decorrelates the HAVING-fraction scalar. Split out so the supplier-join
    plan pin (tests/test_aqe_broadcast_pins.py) can observe the
    lineitem⋈supplier join: the eager checkpoint truncates lineage, so the
    registered query's own plan shows only the post-checkpoint threshold
    compare and the join would otherwise be un-pinnable."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")  # bounded: 25-row nation dim
    return (
        # unhinted (r8): supp is supplier-sized — grows with the corpus
        l.join(supp, l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_decimal_revenue()).alias("value"))
    )


@register(
    "q11_important_parts",
    """WITH val AS (SELECT l.l_partkey,
                          sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS value
                   FROM lineitem l
                   JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   JOIN nation n ON s.s_nationkey = n.n_nationkey
                   WHERE n.n_name IN ('NATION_3', 'NATION_7')
                   GROUP BY l.l_partkey)
       SELECT l_partkey, CAST(value AS DOUBLE) AS value
       FROM val
       WHERE value > (SELECT sum(value) * 0.001 FROM val)""",
    "EXT-AGG",
    tier=1,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose traded value through two nations'
    suppliers exceeds a fraction of the total. The HAVING-fraction scalar
    decorrelates exactly like q15's max: the per-part value table
    checkpoints once, its grand total broadcasts as a 1-row cross join.
    Decimal sums both levels — the threshold compare is exact, no float
    cliff at the cutoff."""
    val = _q11_part_value(spark, sf_dir).localCheckpoint()
    total = val.agg((F.sum("value") * F.lit(0.001).cast("decimal(18,4)")).alias("__thr"))
    return (
        val.join(F.broadcast(total))  # bounded: 1-row scalar threshold
        .filter(F.col("value") > F.col("__thr"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@register(
    "q12_priority_by_returnflag",
    """SELECT l.l_returnflag,
              CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l.l_returnflag""",
    "EXT-AGG",
    tier=1,
)
def q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H Q12 shape (shipmode reshaped to returnflag): case-counting
    pivot of order priority per lineitem class, one year of shipments.
    The date filter pushes to the lineitem scan (min/max row-group skip);
    the pivot is two conditional sums in ONE aggregation pass."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_count_by_part",
    """SELECT p.p_brand, p.p_type, p.p_size,
              CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_brand <> 'Brand#2' AND p.p_type <> 'PROMO' AND p.p_size <= 10
         AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
       GROUP BY p.p_brand, p.p_type, p.p_size""",
    "EXT-AGG", "EXT-SET",
    tier=1,
)
def q16_supplier_count_by_part(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per part attribute group,
    excluding one brand/type and blacklisted suppliers (negative balance
    standing in for the '%Complaints%' comment scan). NOT IN compiles to a
    broadcast anti-join (the blacklist is tiny at any scale); the distinct
    count is Spark's two-phase partial-distinct aggregate, no row explosion."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 10)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # unhinted (r8): bad/part are dimension-sized — grow with the corpus
        l.join(bad, l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_share_suppliers",
    """WITH shipped AS (SELECT l.l_partkey, l.l_suppkey,
                              sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty
                       FROM lineitem l
                       JOIN part p ON l.l_partkey = p.p_partkey
                       WHERE p.p_name LIKE 'red%'
                         AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                         AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                       GROUP BY l.l_partkey, l.l_suppkey),
       dominant AS (SELECT DISTINCT s1.l_suppkey
                    FROM shipped s1
                    WHERE s1.qty * 2 > (SELECT sum(s2.qty) FROM shipped s2
                                        WHERE s2.l_partkey = s1.l_partkey))
       SELECT s.s_suppkey, s.s_name, n.n_name
       FROM supplier s
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)""",
    "EXT-AGG", "EXT-SET",
    tier=1,
)
def q20_excess_share_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (availqty reshaped to shipped share): suppliers who
    shipped a majority of some red part's one-year volume. The correlated
    per-part total decorrelates into a window sum over l_partkey; the
    majority test is exact decimal (qty·2 > total — no 0.5 float). The
    final IN is a semi-join onto supplier, so output cardinality is bounded
    by the supplier dim regardless of how many parts a supplier dominates."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    shipped = (
        # unhinted (r8): part grows with the corpus
        l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
    )
    dominant = (
        shipped.withColumn(
            "__total", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("qty") * 2 > F.col("__total"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)  # bounded: 25-row nation dim
        .select("s_suppkey", "s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Driver-window consolidations: single-registration suites that carry several
# independent query shapes into the driver's verified window. Each folded
# shape also stays registered standalone (tier=1 breadth tail) for focused
# plan pins and local oracle checks.
# --------------------------------------------------------------------------

@register(
    "q_scalar_suite",
    f"""SELECT (SELECT revenue FROM ({_Q6_SQL})) AS q6_revenue,
               (SELECT promo_pct FROM ({_Q14_SQL})) AS promo_pct,
               (SELECT avg_yearly FROM ({_Q17_SQL})) AS avg_yearly,
               (SELECT revenue FROM ({_Q19_SQL})) AS q19_revenue""",
    "EXT-AGG",
    tier=1,  # r10: consolidated into t4_profile_scalar_suite
)
def q_scalar_suite(spark, sf_dir):
    """Four single-row TPC-H shapes (Q6 scan-agg, Q14 conditional-ratio,
    Q17 decorrelated scalar subquery, Q19 disjunctive-predicate join) joined
    as 1-row cross products — one driver-verified registration, four
    independent plans. Each sub-plan is exactly the standalone tier-1 query;
    the cross join of singletons adds nothing to any of them."""
    return (
        q6_forecast_revenue(spark, sf_dir)
        .select(F.col("revenue").alias("q6_revenue"))
        .crossJoin(q14_promo_revenue_share(spark, sf_dir))
        .crossJoin(q17_small_quantity_revenue(spark, sf_dir))
        .crossJoin(
            q19_disjunctive_predicate_join(spark, sf_dir).select(
                F.col("revenue").alias("q19_revenue")
            )
        )
    )


@register(
    "w2_3_window_analytics",
    """SELECT event_id, user_id,
              epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                     ORDER BY event_id) AS gap_us,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    2) AS running_value
       FROM events""",
    "EXT-WINDOW",
    tier=1,  # r8: consolidated into w4_window_suite (driver row); stays in bench HEADLINE
)
def w2_3_window_analytics(spark, sf_dir):
    """Analytic lag() + explicit-frame running sum in ONE window pass: both
    functions share the (user_id, event_id) partitioning/ordering, so Spark
    plans a single shuffle + single sort + one Window node — the fused form
    of the standalone w2/w3 queries."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.round(F.sum("value").over(frame), 2).alias("running_value"),
    )


@register(
    "set_operations",
    f"""SELECT 'union' AS kind, custkey FROM ({_SET1_SQL})
        UNION ALL
        SELECT 'intersect' AS kind, custkey FROM ({_SET2_SQL})
        UNION ALL
        SELECT 'except' AS kind, custkey FROM ({_SET3_SQL})""",
    "EXT-SET", "OP-05",
    tier=1,  # r8: consolidated into s2_setgroup_suite (driver row); OP-05 stays tier-0-covered via op05_19/x01
)
def set_operations(spark, sf_dir):
    """§2.7 set-operation family (UNION / INTERSECT / EXCEPT) as one tagged
    result — each branch is the exact standalone set1/set2/set3 plan; the
    EXCEPT branch doubles as OP-05's ON CONFLICT DO NOTHING anti-semijoin
    formulation (index.mjs:55)."""
    branches = [
        set1_union_distinct(spark, sf_dir).select(
            F.lit("union").alias("kind"), "custkey"
        ),
        set2_intersect(spark, sf_dir).select(
            F.lit("intersect").alias("kind"), "custkey"
        ),
        set3_except_anti(spark, sf_dir).select(
            F.lit("except").alias("kind"), "custkey"
        ),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


@register(
    "g_grouping_analytics",
    """SELECT 'rollup' AS kind, o_orderstatus, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       UNION ALL
       SELECT 'cube' AS kind, o_orderstatus, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       UNION ALL
       SELECT 'gsets' AS kind, o_orderstatus, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    "EXT-AGG",
    tier=1,  # r8: consolidated into s2_setgroup_suite (driver row)
)
def g_grouping_analytics(spark, sf_dir):
    """ROLLUP + CUBE + GROUPING SETS over orders as one tagged union — all
    three are the same Expand-node machinery (multi-grouping-set aggregate in
    one scan each); the tag keeps every grouping combination's provenance in
    the hash-checked result."""
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")]
    rollup = o.rollup("o_orderstatus", "o_orderpriority").agg(*aggs).select(
        F.lit("rollup").alias("kind"), "o_orderstatus", "o_orderpriority", "n", "total"
    )
    cube = o.cube("o_orderstatus", "o_orderpriority").agg(*aggs).select(
        F.lit("cube").alias("kind"), "o_orderstatus", "o_orderpriority", "n", "total"
    )
    gsets = (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
        )
        .agg(*aggs)
        .select(
            F.lit("gsets").alias("kind"), "o_orderstatus", "o_orderpriority", "n", "total"
        )
    )
    return rollup.unionByName(cube).unionByName(gsets)


@register(
    "p2_percentile_disc_distributed",
    """WITH c AS (SELECT l_returnflag, l_extendedprice AS v, count(*) AS cnt
                 FROM lineitem GROUP BY 1, 2),
       w AS (SELECT l_returnflag, v,
                    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
                    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
             FROM c)
       SELECT l_returnflag,
              min(CASE WHEN cum >= floor(0.25 * (n - 1)) + 1 THEN v END) AS p25,
              min(CASE WHEN cum >= floor(0.50 * (n - 1)) + 1 THEN v END) AS p50,
              min(CASE WHEN cum >= floor(0.75 * (n - 1)) + 1 THEN v END) AS p75
       FROM w GROUP BY l_returnflag""",
    "EXT-AGG",
    tier=1,  # r10: consolidated into j13 (stays in bench HEADLINE, r4 series)
)
def p2_percentile_disc_distributed(spark, sf_dir):
    """Scale-tier EXACT percentiles (discrete): pre-aggregate to
    (flag, value) counts — map-side partial aggregation shrinks the shuffle
    from |lineitem| rows to |distinct values| — then a cumulative-count
    window over the tiny value-histogram picks the rank-⌊p·(n−1)⌋+1 element.
    Unlike the holistic ``percentile`` of p1 (which routes the ENTIRE fact
    table to 3 reducers), every fact-table-sized stage here is a partial
    agg; only the histogram (bounded by value cardinality) crosses the
    3-key shuffle. Values pass through untouched (no interpolation
    arithmetic), so the cross-engine hash is exact. The t-digest
    ``approx_percentile`` sketch remains the bounded-error alternative when
    even the histogram is too wide (tests/test_approx.py)."""
    l = _t(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("v")
    wall = Window.partitionBy("l_returnflag")
    hist = counts.select(
        "l_returnflag",
        "v",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def pick(p: float, name: str):
        target = F.floor(F.lit(p) * (F.col("n") - 1)) + 1
        return F.min(F.when(F.col("cum") >= target, F.col("v"))).alias(name)

    return hist.groupBy("l_returnflag").agg(
        pick(0.25, "p25"), pick(0.50, "p50"), pick(0.75, "p75")
    )


@register(
    "j12_temporal_joins",
    f"""SELECT 'asof' AS kind, event_id, user_id, ts_us, click_ts_us, click_value,
               CAST(NULL AS BIGINT) AS signup_id, CAST(NULL AS VARCHAR) AS event_type
        FROM ({_J1_SQL})
        UNION ALL
        SELECT 'interval' AS kind, event_id, CAST(NULL AS BIGINT) AS user_id,
               ts_us, CAST(NULL AS BIGINT) AS click_ts_us,
               CAST(NULL AS DOUBLE) AS click_value, signup_id, event_type
        FROM ({_J2_SQL})""",
    "EXT-JOIN",
    tier=1,  # r10: consolidated into j13_order_temporal_suite
)
def j12_temporal_joins(spark, sf_dir):
    """Both temporal-join operators in one tagged result: the as-of join
    (union + single-shuffle window, never an inequality join) and the
    bucketed interval join (equi-join on (key, bucket), never a nested
    loop) — each branch is the exact standalone j1/j2 plan."""
    asof = j1_asof_join(spark, sf_dir).select(
        F.lit("asof").alias("kind"),
        "event_id",
        "user_id",
        "ts_us",
        "click_ts_us",
        "click_value",
        F.lit(None).cast("long").alias("signup_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    interval = j2_interval_join(spark, sf_dir).select(
        F.lit("interval").alias("kind"),
        "event_id",
        F.lit(None).cast("long").alias("user_id"),
        "ts_us",
        F.lit(None).cast("long").alias("click_ts_us"),
        F.lit(None).cast("double").alias("click_value"),
        "signup_id",
        "event_type",
    )
    return asof.unionByName(interval)


@register(
    "p3_approx_sketches",
    None,  # sketch outputs are implementation-defined — rows-only driver
           # check; error bounds vs the exact tiers are asserted in
           # tests/test_approx.py::test_registered_sketch_bounds
    "EXT-AGG",
    tier=1,
)
def p3_approx_sketches(spark, sf_dir):
    """The bounded-error sketch tier REGISTERED (VERDICT r1 item 3): per
    returnflag, HyperLogLog++ distinct orders (`approx_count_distinct`,
    rsd 1%) and t-digest price quantiles (`approx_percentile`, accuracy
    10000). Both sketches are map-side mergeable — the whole query is one
    partial+final aggregation over the fact table, no holistic agg, no
    value histogram — the tier that stays cheap when even p1/p2's distinct-
    value histogram is too wide at 100 TB. No SQL oracle on purpose:
    sketch estimates are implementation-defined, so the contract is the
    error bound (asserted vs the exact tiers in tests/test_approx.py),
    not a cross-engine hash."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias(
            "approx_p95"
        ),
    )


@register(
    "j3_full_outer_reconcile",
    """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
                 FROM events WHERE event_type = 'click' GROUP BY user_id),
       p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
                    round(sum(value), 2) AS purchase_value
             FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT COALESCE(c.user_id, p.user_id) AS user_id,
              COALESCE(c.n_clicks, 0) AS n_clicks,
              COALESCE(p.n_purchases, 0) AS n_purchases,
              COALESCE(p.purchase_value, 0.0) AS purchase_value,
              (c.user_id IS NOT NULL AND p.user_id IS NOT NULL) AS both_sides
       FROM c FULL OUTER JOIN p ON c.user_id = p.user_id""",
    "EXT-JOIN",
    tier=1,
)
def j3_full_outer_reconcile(spark, sf_dir):
    """Full-outer reconciliation (the one join type the registry lacked):
    per-user click stats merged with purchase stats, keys coalesced,
    metrics zero-filled, plus a both-sides flag. Both inputs pre-aggregate
    BEFORE the join (fact-table rows never cross the outer join), the
    filters push to the scan, and the two aggs + join share the user_id
    shuffle key so AQE plans one co-partitioned exchange per side."""
    e = _t(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("purchase_value"),
        )
    )
    return (
        c.withColumnRenamed("user_id", "cu")
        .join(p.withColumnRenamed("user_id", "pu"), F.col("cu") == F.col("pu"), "full_outer")
        .select(
            F.coalesce("cu", "pu").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
            (F.col("cu").isNotNull() & F.col("pu").isNotNull()).alias("both_sides"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H completion: the two shapes the suite still lacked. q8 = the
# 7-table star join with a conditional-sum market-share ratio; q15 = the
# grouped-revenue view filtered by equality with its own scalar max (ties
# surface — deliberately NOT a top-1 sort). The fixture schema has no
# partsupp, so q8 markets by p_type on the lineitem bridge; revenue sums
# are exact decimal so q15's equality-with-max comparison is bit-stable.
# --------------------------------------------------------------------------


_Q8_SQL = """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
              CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                   AS DOUBLE) AS mkt_share
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       JOIN region r ON cn.n_regionkey = r.r_regionkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
       GROUP BY year(o.o_orderdate)"""


@register("q8_market_share", _Q8_SQL, "EXT-AGG", tier=1)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 7-table join (every dim broadcast, lineitem never
    shuffled until the final year agg) with a conditional-sum ratio — one
    nation's share of a region+type market per year. Numerator and
    denominator are exact decimal sums, divided in double at the edge, so
    the ratio is bit-identical under any accumulation order."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _decimal_revenue()
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # unhinted p/s (r8): part/supplier grow with the corpus; the
        # bounded: 25-row nation projections and 5-row region keep hints
        .join(p, l.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_reg") == F.col("r_regionkey"))  # bounded: 5-row region dim
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))  # bounded: 25-row nation projection
    )
    zero = F.lit(0).cast("decimal(18,4)")
    nation5 = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(zero)
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(nation5).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )






_Q15_SQL = """WITH rev AS (
         SELECT l.l_suppkey,
                sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS total_rev
         FROM lineitem l
         WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         GROUP BY l.l_suppkey)
       SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
       FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
       WHERE r.total_rev = (SELECT max(total_rev) FROM rev)"""


@register("q15_top_supplier", _Q15_SQL, "EXT-TOPK", tier=1)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarterly revenue view per supplier, equality with
    the view's scalar max (NOT a top-1 sort: ties all surface). The max
    crosses back as a broadcast 1-row join over the reused grouped
    aggregate; exact decimal sums make the equality safe — with double
    sums, revenue == max(revenue) is exactly the comparison that breaks."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = _t(spark, sf_dir, "supplier")
    # rev feeds BOTH the scalar max and the equality join; localCheckpoint
    # materializes the (supplier-sized) table once so lineitem is scanned
    # and aggregated a single time — measured: 2 lineitem scans without it
    rev = (
        l.groupBy("l_suppkey")
        .agg(F.sum(_decimal_revenue()).alias("total_rev"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))  # bounded: 1-row scalar aggregate
        .filter(F.col("total_rev") == F.col("__mx"))
        # unhinted (r8): supplier grows with the corpus (the winner side is
        # tiny, and AQE picks it as the build side at runtime)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
    )










# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation) and time-series gap-fill
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PV1_SQL = """SELECT user_id, """ + ", ".join(
    f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in _EVENT_TYPES
) + """
       FROM events GROUP BY user_id"""


@register("pv1_event_type_pivot", _PV1_SQL, "EXT-AGG", tier=1)
def pv1_event_type_pivot(spark, sf_dir):
    """Pivot: one row per user, one count column per event type — Spark's
    native ``pivot`` with the value list PINNED (never the two-pass
    distinct-scan inference, which is both an extra job and a
    nondeterministic column order at scale). Plans as a single hash
    aggregate with per-column conditional counts — identical shape to the
    oracle's CASE sums, one shuffle."""
    e = _t(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES]
    )


#: Fixed hourly grid spanning the fixture's event window. A FIXED grid (not
#: min/max-derived) keeps the output schedule-stable and lets both engines
#: generate it without a data-dependent pre-pass.
_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-30 23:00:00"

_TS1_SQL = f"""WITH grid AS (
         SELECT t.ts_h, e.event_type
         FROM generate_series(TIMESTAMP '{_GRID_START}',
                              TIMESTAMP '{_GRID_END}',
                              INTERVAL 1 HOUR) AS t(ts_h)
         CROSS JOIN (SELECT DISTINCT event_type FROM events) e),
       buck AS (
         SELECT event_type, date_trunc('hour', ts) AS ts_h,
                CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS DOUBLE)
                  / (count(*) * 1000000.0) AS v
         FROM events GROUP BY 1, 2),
       joined AS (
         SELECT g.event_type, g.ts_h, b.v FROM grid g
         LEFT JOIN buck b ON g.event_type = b.event_type AND g.ts_h = b.ts_h),
       ctx AS (
         SELECT event_type, ts_h, v,
                last_value(v IGNORE NULLS) OVER w_prev AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN ts_h END IGNORE NULLS)
                    OVER w_prev AS pt,
                first_value(v IGNORE NULLS) OVER w_next AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN ts_h END IGNORE NULLS)
                    OVER w_next AS nt
         FROM joined
         WINDOW w_prev AS (PARTITION BY event_type ORDER BY ts_h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                w_next AS (PARTITION BY event_type ORDER BY ts_h
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       SELECT event_type, epoch_us(ts_h) AS ts_h_us,
              (v IS NOT NULL) AS observed,
              CASE WHEN v IS NOT NULL THEN v
                   WHEN pv IS NULL THEN nv
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv)
                        * (CAST(epoch_us(ts_h) - epoch_us(pt) AS DOUBLE)
                           / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
              END AS v_interp
       FROM ctx"""


@register("ts1_gapfill_interpolate", _TS1_SQL, "EXT-06", tier=1)
def ts1_gapfill_interpolate(spark, sf_dir):
    """Time-series gap-fill: hourly buckets per event type on a FIXED
    grid, empty buckets filled by LINEAR interpolation between the
    nearest observed neighbors (edge gaps take the nearest single
    neighbor). The regularization step every downstream ts model needs.

    Plan: the grid is generated in-plan (sequence + explode × a 5-row
    dim — no data-dependent pre-pass), bucket means use exact
    quantized-integer sums (bit-identical across engines and summation
    orders), and prev/next context is two doc-partitioned window passes
    with IGNORE NULLS — all JVM built-ins, two shuffles (bucket agg +
    grid join/windows) at any scale. The interpolation arithmetic is the
    same expression tree in both engines over bit-identical inputs, so
    the unrounded doubles hash-match."""
    e = _t(spark, sf_dir, "events")
    types = e.select("event_type").distinct()
    grid = (
        spark.range(1)
        .select(
            F.explode(
                # ntz literals cast to UTC timestamps — the same shape
                # normalize_events_ts gives the ts column (the reader pins
                # the session timezone to UTC, so the cast is exact)
                F.expr(
                    f"sequence(cast(cast('{_GRID_START}' as timestamp_ntz) as timestamp),"
                    f" cast(cast('{_GRID_END}' as timestamp_ntz) as timestamp),"
                    " interval 1 hour)"
                )
            ).alias("ts_h")
        )
        .crossJoin(types)
    )
    buck = (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("ts_h"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 1000000.0).cast("long")).cast(
                    "double"
                )
                / (F.count("*") * F.lit(1000000.0))
            ).alias("v")
        )
    )
    joined = grid.join(buck, ["event_type", "ts_h"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("ts_h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("ts_h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("v").isNotNull(), F.col("ts_h"))
    ctx = joined.select(
        "event_type",
        "ts_h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(t_obs, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(t_obs, ignorenulls=True).over(w_next).alias("nt"),
    )
    ratio = (
        (F.unix_micros("ts_h") - F.unix_micros("pt")).cast("double")
        / (F.unix_micros("nt") - F.unix_micros("pt")).cast("double")
    )
    return ctx.select(
        "event_type",
        F.unix_micros("ts_h").alias("ts_h_us"),
        F.col("v").isNotNull().alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * ratio)
        .alias("v_interp"),
    )


_S1_SQL = """WITH ordered AS (
         SELECT user_id, ts, value,
                CASE WHEN epoch_us(ts)
                          - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                          > 1800000000
                       OR lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS new_s,
                event_id
         FROM events),
       tagged AS (
         SELECT user_id, ts, value,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS session_id
         FROM ordered)
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              min(epoch_us(ts)) AS session_start_us,
              max(epoch_us(ts)) AS session_end_us,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS DOUBLE)
                / 1000000.0 AS sum_value
       FROM tagged GROUP BY user_id, session_id"""


@register("s1_batch_sessionize", _S1_SQL, "EXT-06", tier=1)
def s1_batch_sessionize(spark, sf_dir):
    """Batch sessionization — the gaps-and-islands twin of the x19
    STREAMING session window: a new session starts after a >30-min silence
    per user; sessions number ordinally by a running sum of the new-session
    flag. One shuffle (user partition), all window built-ins, tie-broken
    by event_id so identical timestamps can't reorder across engines;
    session value sums are exact quantized integers."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_s = (
        F.when(
            (us - F.lag(us).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0)
    )
    tagged = e.select(
        "user_id",
        "ts",
        "value",
        F.sum(new_s)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return tagged.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
        F.count("*").alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 1000000.0).cast("long")).cast("double")
            / 1000000.0
        ).alias("sum_value"),
    )


_TS2_SQL = """SELECT event_type, event_id, epoch_us(ts) AS ts_us,
              CAST(count(*) OVER w AS BIGINT) AS n_6h,
              CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) OVER w
                   AS DOUBLE)
                / (count(*) OVER w * 1000000.0) AS avg_6h
       FROM events
       WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                    RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)"""


@register("ts2_rolling_time_range", _TS2_SQL, "EXT-06", tier=1)
def ts2_rolling_time_range(spark, sf_dir):
    """Trailing 6-hour rolling count/mean per event type — a TIME-RANGE
    window frame (rangeBetween over epoch micros), not a row frame: each
    event sees exactly the events inside its trailing wall-clock interval
    however unevenly they arrive. Range frames include all ORDER-BY peers,
    so identical timestamps are frame-stable across engines; the mean is
    an exact quantized-integer sum over the frame divided in double."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("event_type")
        .orderBy(us)
        .rangeBetween(-21_600_000_000, 0)
    )
    vi = F.round(F.col("value") * 1000000.0).cast("long")
    return e.select(
        "event_type",
        "event_id",
        us.alias("ts_us"),
        F.count("*").over(w).alias("n_6h"),
        (
            F.sum(vi).over(w).cast("double")
            / (F.count("*").over(w) * F.lit(1000000.0))
        ).alias("avg_6h"),
    )

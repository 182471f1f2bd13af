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


@register(
    "q6_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.03 AND 0.07
         AND l_quantity < 24""",
    "EXT-AGG",
)
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

@register(
    "set1_union_distinct",
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""",
    "EXT-SET",
)
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


@register(
    "set2_intersect",
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT
       SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""",
    "EXT-SET",
)
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


@register(
    "set3_except_anti",
    """SELECT c_custkey AS custkey FROM customer
       EXCEPT
       SELECT o_custkey AS custkey FROM orders""",
    "EXT-SET", "OP-05",
)
def set3_except_anti(spark, sf_dir):
    """EXCEPT — also the engine-level formulation of OP-05's
    ``ON CONFLICT DO NOTHING`` (anti-semijoin against sink keys,
    index.mjs:55): customers with no orders."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o.distinct()).distinct()


# --------------------------------------------------------------------------
# grouping sets / rollup (§2.4 "not present" list — engine surface)
# --------------------------------------------------------------------------

@register(
    "g1_rollup_counts",
    """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "EXT-AGG",
)
def g1_rollup_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# temporal joins (§2.3 "not present" list — engine surface; see
# operators/joins.py for the scale strategies)
# --------------------------------------------------------------------------

@register(
    "j1_asof_join",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
       c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
       m AS (SELECT p.event_id, c.ts AS cts, c.value AS cval,
                    row_number() OVER (PARTITION BY p.event_id
                                       ORDER BY c.ts DESC) AS rk
             FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
       SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
              epoch_us(m.cts) AS click_ts_us, m.cval AS click_value
       FROM p LEFT JOIN (SELECT * FROM m WHERE rk = 1) m USING (event_id)""",
    "EXT-JOIN",
)
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


@register(
    "q17_small_quantity_revenue",
    """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cap
             FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_cap""",
    "EXT-AGG",
)
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
        .join(F.broadcast(caps.withColumnRenamed("l_partkey", "cap_partkey")),
              F.col("l_partkey") == F.col("cap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_predicate_join",
    """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30)""",
    "EXT-AGG",
)
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


@register(
    "j2_interval_join",
    """SELECT s.event_id AS signup_id, e.event_id AS event_id,
              e.event_type, epoch_us(e.ts) AS ts_us
       FROM events s JOIN events e
         ON s.user_id = e.user_id
        AND epoch_us(e.ts) >= epoch_us(s.ts) + 1000000
        AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
       WHERE s.event_type = 'signup'""",
    "EXT-JOIN",
)
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
)
def p1_percentiles_by_flag(spark, sf_dir):
    """Exact continuous-interpolation percentiles per group. Exact
    percentile needs the group's values together — one shuffle on a 3-value
    key; at 100 TB switch to approx_percentile (t-digest sketch, map-side
    mergeable) and accept the documented error bound."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
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

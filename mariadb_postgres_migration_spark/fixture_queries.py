"""Oracle-paired operator queries over the driver fixture tables.

Every SURVEY.md §2 operator (OP-nn) is demonstrated as a query over the
TPC-H-ish fixture tables (/root/repo/TESTDATA.md) with a semantically
equivalent DuckDB SQL oracle. The driver hash-compares results
order-insensitively after sorting columns by name, so the registry obeys
hash-stability rules:

* every computed column is aliased identically in Spark and SQL;
* timestamps never cross the boundary raw — they are converted with
  ``unix_micros`` (Spark) / ``epoch_us`` (DuckDB) to int64;
* computed integers are cast to long/BIGINT on the Spark side (DuckDB
  ``length``/``count`` return BIGINT);
* doubles are either raw pass-throughs (bit-identical in both engines) or
  ratios/sums rounded where accumulation order could differ;
* regex/caret helpers are wrapped in ``coalesce(..., '')`` so no-match
  behavior agrees.

Where an operator is a side effect (OP-04 sink, OP-06 sequence fixup, OP-07
clustered write, OP-32 DAG) it is exercised in tests/ instead and noted here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import caret_count
from .operators.aggregates import max_id
from .operators.threading import resolve_backrefs, resolve_backrefs_scaled
from .registry import PASSWORD_PLACEHOLDER, SEP, _t, member_oracle, register


# --------------------------------------------------------------------------
# §2.1 scans
# --------------------------------------------------------------------------

@register(
    "op01_full_scan",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "OP-01",
    tier=1,
)
def op01_full_scan(spark, sf_dir):
    """OP-01 (queries.mjs:4-5): full-table scan, lazy + schema-pinned.
    (Breadth tail: OP-01 is driver-verified via op03_sorted_scan.)"""
    return _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@register(
    "op02_projected_scan",
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "OP-02",
    tier=1,
)
def op02_projected_scan(spark, sf_dir):
    """OP-02 (queries.mjs:6-7): projected scan; Catalyst prunes the parquet
    read schema to exactly these columns (check: ReadSchema in explain).
    (Breadth tail: OP-02 is driver-verified via op08_rename_projection,
    whose projection prunes the events scan the same way.)"""
    return _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "op03_sorted_scan",
    """SELECT event_id, user_id, event_type FROM events ORDER BY user_id, event_id""",
    "OP-01", "OP-03",
    tier=1,
)
def op03_sorted_scan(spark, sf_dir):
    """OP-01/OP-03 (queries.mjs:3-5): full scan of every events row + the
    reference's two-key sorted scan. In-engine the ordering requirement
    normally lives in a window spec; a global sort is a range shuffle here."""
    return (
        _t(spark, sf_dir, "events")
        .orderBy("user_id", "event_id")
        .select("event_id", "user_id", "event_type")
    )


@register(
    "op05_conflict_dedup",
    "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
    "OP-05",
    tier=1,
)
def op05_conflict_dedup(spark, sf_dir):
    """OP-05 (index.mjs:55 ``ON CONFLICT DO NOTHING``): the queryable core is
    key-dedup before append; map-side partial distinct + one shuffle."""
    return _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()


# --------------------------------------------------------------------------
# §2.2 projections / filters / repairs
# --------------------------------------------------------------------------

@register(
    "op08_rename_projection",
    """SELECT event_id AS id, user_id AS from_user, event_type AS title,
              epoch_us(ts) AS created_at_us
       FROM events""",
    "OP-02", "OP-08",
    tier=1,
)
def op08_rename_projection(spark, sf_dir):
    """OP-02/OP-08 (queries.mjs:6-7, column_sets.mjs:73-91): projected scan
    (Catalyst prunes the parquet ReadSchema to exactly these columns) with
    declarative renames (from→from_user, subject→title analog)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("id"),
        F.col("user_id").alias("from_user"),
        F.col("event_type").alias("title"),
        F.unix_micros("ts").alias("created_at_us"),
    )


@register(
    "op09_10_constant_filter",
    f"""SELECT c_custkey, c_name AS username, '{PASSWORD_PLACEHOLDER}' AS password,
               c_mktsegment
        FROM customer WHERE c_mktsegment = 'BUILDING'""",
    "OP-09", "OP-10",
    tier=1,
)
def op09_10_constant_filter(spark, sf_dir):
    """OP-09 + OP-10 (index.mjs:24, index.mjs:97) in one pass: equality
    filter pushed into the parquet scan (PushedFilters) and a config-constant
    column overwrite on the surviving rows."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            "c_custkey",
            F.col("c_name").alias("username"),
            F.lit(PASSWORD_PLACEHOLDER).alias("password"),
            "c_mktsegment",
        )
    )


@register(
    "op09_constant_substitution",
    f"""SELECT c_custkey, c_name AS username, '{PASSWORD_PLACEHOLDER}' AS password
        FROM customer""",
    "OP-09",
    tier=1,
)
def op09_constant_substitution(spark, sf_dir):
    """OP-09 (index.mjs:24): overwrite a column with a config constant."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("username"),
        F.lit(PASSWORD_PLACEHOLDER).alias("password"),
    )


@register(
    "op10_equality_filter",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
    "OP-10",
    tier=1,
)
def op10_equality_filter(spark, sf_dir):
    """OP-10 (index.mjs:97): equality filter; pushed into the parquet scan
    (check: PushedFilters in explain)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "op11_regex_prefix_predicate",
    r"""SELECT event_id,
               CAST(length(coalesce(regexp_extract(
                   repeat('^', CAST(event_id % 4 AS INT)) || event_type,
                   '^(\^+)', 1), '')) AS BIGINT) AS caret_n
        FROM events
        WHERE length(coalesce(regexp_extract(
                  repeat('^', CAST(event_id % 4 AS INT)) || event_type,
                  '^(\^+)', 1), '')) > 0""",
    "OP-11", "OP-23",
    tier=1,
)
def op11_regex_prefix_predicate(spark, sf_dir):
    """OP-11/OP-23 (index.mjs:62): leading-caret regex predicate + extract,
    on synthesized caret-prefixed content (fixtures carry no carets)."""
    e = _t(spark, sf_dir, "events")
    content = F.concat(
        F.repeat(F.lit("^"), (F.col("event_id") % 4).cast("int")), F.col("event_type")
    )
    n = F.coalesce(caret_count(content), F.lit(0)).cast("long")
    return e.select("event_id", n.alias("caret_n")).filter(F.col("caret_n") > 0)


@register(
    "op12_14_repair_parse",
    """SELECT event_id,
              coalesce(CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_id END,
                       user_id) AS resolved_id,
              coalesce(CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END,
                       -1) AS user_or_default,
              epoch_us(try_strptime(
                  CASE WHEN event_id % 7 = 0 THEN '0000-00-00 00:00:00'
                       WHEN event_id % 11 = 0 THEN 'not a timestamp'
                       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END,
                  '%Y-%m-%d %H:%M:%S')) AS repaired_us,
              TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
              TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS round_trip
       FROM events""",
    "OP-12", "OP-13", "OP-14", "OP-24", "OP-25", "OP-27",
    tier=1,
)
def op12_14_repair_parse(spark, sf_dir):
    """The ColumnSet repair/parse layer (SURVEY §2.2/§2.8) in one projection
    over events — exactly how the reference applies them (one per-row render
    pass, column_sets.mjs:10-23,67-70; index.mjs:25,99,106):

    * OP-12 coalesce-of-columns (``v.id || v.video_id``)
    * OP-13 NULL→sink-default repair
    * OP-14/OP-25 invalid-timestamp repair incl. MySQL zero-dates
      (``try_to_timestamp`` keeps ANSI mode non-throwing)
    * OP-24 JSON parse to typed value (malformed → NULL)
    * OP-27 int parse (``parseInt`` analog via try_cast)
    """
    e = _t(spark, sf_dir, "events")
    maybe = F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(F.col("event_id"))
    nulled = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("user_id"))
    raw_ts = (
        F.when(F.col("event_id") % 7 == 0, F.lit("0000-00-00 00:00:00"))
        .when(F.col("event_id") % 11 == 0, F.lit("not a timestamp"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    return e.select(
        "event_id",
        F.coalesce(maybe, F.col("user_id")).alias("resolved_id"),
        F.coalesce(nulled, F.lit(-1)).alias("user_or_default"),
        F.unix_micros(
            F.try_to_timestamp(raw_ts, F.lit("yyyy-MM-dd HH:mm:ss"))
        ).alias("repaired_us"),
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        F.col("event_id").cast("string").try_cast("long").alias("round_trip"),
    )


@register(
    "op12_coalesce_columns",
    """SELECT event_id,
              coalesce(CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_id END,
                       user_id) AS resolved_id
       FROM events""",
    "OP-12",
    tier=1,
)
def op12_coalesce_columns(spark, sf_dir):
    """OP-12 (index.mjs:106 ``v.id || v.video_id``): first-non-null across
    two id shapes (one synthesized nullable)."""
    e = _t(spark, sf_dir, "events")
    maybe = F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(F.col("event_id"))
    return e.select("event_id", F.coalesce(maybe, F.col("user_id")).alias("resolved_id"))


@register(
    "op13_null_default_repair",
    """SELECT event_id,
              coalesce(CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END,
                       -1) AS user_or_default
       FROM events""",
    "OP-13",
    tier=1,
)
def op13_null_default_repair(spark, sf_dir):
    """OP-13 (column_sets.mjs:67-70): NULL → sink-default repair, default
    modeled as a concrete value (SURVEY §7.2)."""
    e = _t(spark, sf_dir, "events")
    nulled = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("user_id"))
    return e.select("event_id", F.coalesce(nulled, F.lit(-1)).alias("user_or_default"))


@register(
    "op14_timestamp_repair",
    """SELECT event_id,
              epoch_us(try_strptime(
                  CASE WHEN event_id % 7 = 0 THEN '0000-00-00 00:00:00'
                       WHEN event_id % 11 = 0 THEN 'not a timestamp'
                       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END,
                  '%Y-%m-%d %H:%M:%S')) AS repaired_us
       FROM events""",
    "OP-14", "OP-25",
    tier=1,
)
def op14_timestamp_repair(spark, sf_dir):
    """OP-14/OP-25 (column_sets.mjs:10-17): ts_default_fallback — MySQL
    zero-dates and garbage strings parse to NULL (the sink default), valid
    strings round-trip. ``try_to_timestamp`` keeps this ANSI-safe."""
    e = _t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 7 == 0, F.lit("0000-00-00 00:00:00"))
        .when(F.col("event_id") % 11 == 0, F.lit("not a timestamp"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    repaired = F.try_to_timestamp(raw, F.lit("yyyy-MM-dd HH:mm:ss"))
    return e.select("event_id", F.unix_micros(repaired).alias("repaired_us"))


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------

@register(
    "op15_three_way_join",
    """SELECT o.o_orderkey, l.l_linenumber, p.p_name, l.l_quantity
       FROM orders o, lineitem l, part p
       WHERE o.o_orderkey = l.l_orderkey AND l.l_partkey = p.p_partkey""",
    "OP-15",
)
def op15_three_way_join(spark, sf_dir):
    """OP-15 (queries.mjs:8-11): 3-way inner equi-join, comma-join + WHERE in
    the reference; declarative joins here so Catalyst broadcast-selects the
    part dim and AQE handles runtime skew."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .select("o_orderkey", "l_linenumber", "p_name", "l_quantity")
    )


@register(
    "op16_broadcast_lookup_join",
    """SELECT o.o_orderkey, c.c_name, o.o_totalprice
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_mktsegment = 'BUILDING'""",
    "OP-16",
    tier=1,
)
def op16_broadcast_lookup_join(spark, sf_dir):
    """OP-16 (index.mjs:96-110): the JS Map build/probe as an explicit
    broadcast hash join; inner semantics silently drop probe rows with no
    build match, exactly like ``Map.get`` → undefined."""
    from .operators.joins import broadcast_lookup

    o = _t(spark, sf_dir, "orders")
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    return broadcast_lookup(o, c, on="o_custkey").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "op17_dict_lookup_join",
    """SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey""",
    "OP-17",
    tier=1,
)
def op17_dict_lookup_join(spark, sf_dir):
    """OP-17 (index.mjs:41-45): dictionary lookup as a broadcast map-side
    join — the tag→normalized Map generalized to any small dim."""
    from .operators.joins import broadcast_lookup

    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), F.col("r_name").alias("region_name")
    )
    return broadcast_lookup(n, r, on="n_regionkey").select(
        "n_nationkey", "n_name", "region_name"
    )


# --------------------------------------------------------------------------
# §2.4 aggregation (incl. the flagship) + §2.6
# --------------------------------------------------------------------------

@register(
    "op18_flagship_group_concat",
    f"""SELECT o.o_orderkey, o.o_orderstatus,
               array_to_string(list_sort(list_distinct(list(p.p_brand))), '{SEP}') AS tags,
               CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_tags
        FROM orders o, lineitem l, part p
        WHERE o.o_orderkey = l.l_orderkey AND l.l_partkey = p.p_partkey
        GROUP BY o.o_orderkey, o.o_orderstatus""",
    "OP-15", "OP-18",
)
def op18_flagship_group_concat(spark, sf_dir):
    """Flagship (entry point B): the reference's videos_with_tags query
    (queries.mjs:8-11) — 3-way join + GROUP_CONCAT(DISTINCT … SEPARATOR ',,,')
    — re-expressed as join → shuffle agg with a deterministic sorted set.
    MySQL's unspecified element order becomes ``array_sort`` (SURVEY §7.3)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # pre-aggregate the tag set on the FACT side before touching orders
    # (q18's pattern): the orders join then carries one row per order
    # instead of one per lineitem — measured 1.9× at sf0.1 (1.77s → 0.95s)
    # vs joining first and aggregating after. One collect_set serves both
    # outputs: a separate countDistinct would force a multi-aggregate
    # expand plan for a value that equals size(set).
    pre = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("__set"))
    )
    return pre.join(o, F.col("l_orderkey") == o.o_orderkey).select(
        "o_orderkey",
        "o_orderstatus",
        F.array_join("__set", SEP).alias("tags"),
        F.size("__set").cast("long").alias("n_tags"),
    )


@register(
    "op09_11_predicate_suite",
    f"""SELECT 'const_filter' AS kind, c_custkey AS id, CAST(0 AS BIGINT) AS v,
               username AS s1, password || '|' || c_mktsegment AS s2
        FROM ({member_oracle('op09_10_constant_filter')})
        UNION ALL
        SELECT 'regex', event_id, caret_n, NULL, NULL
        FROM ({member_oracle('op11_regex_prefix_predicate')})""",
    "OP-09", "OP-10", "OP-11", "OP-23",
    tier=1,
)
def op09_11_predicate_suite(spark, sf_dir):
    """Driver-verified consolidation of the predicate micro-queries
    (window-slot economy, VERDICT r4 item 4): OP-09/OP-10 constant
    substitution + pushed equality filter (op09_10_constant_filter) and
    OP-11/OP-23 regex-prefix predicate + extract
    (op11_regex_prefix_predicate), kind-tagged into one shape. Both member
    queries stay registered standalone at tier 1 with full-fidelity
    oracles."""
    cf = op09_10_constant_filter(spark, sf_dir).select(
        F.lit("const_filter").alias("kind"),
        F.col("c_custkey").alias("id"),
        F.lit(0).cast("long").alias("v"),
        F.col("username").alias("s1"),
        F.concat_ws("|", "password", "c_mktsegment").alias("s2"),
    )
    rx = op11_regex_prefix_predicate(spark, sf_dir).select(
        F.lit("regex").alias("kind"),
        F.col("event_id").alias("id"),
        F.col("caret_n").alias("v"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
    )
    return cf.unionAll(rx)


@register(
    "op09_14_scalar_repair_suite",
    f"""SELECT 'p_' || kind AS kind, id, v AS v1,
               CAST(0 AS BIGINT) AS v2, CAST(0 AS BIGINT) AS v3,
               CAST(0 AS BIGINT) AS v4, CAST(0 AS BIGINT) AS v5, s1, s2
        FROM ({member_oracle('op09_11_predicate_suite')})
        UNION ALL
        SELECT 'repair', event_id, resolved_id, user_or_default, repaired_us,
               k, round_trip, NULL, NULL
        FROM ({member_oracle('op12_14_repair_parse')})""",
    "OP-09", "OP-10", "OP-11", "OP-12", "OP-13", "OP-14",
    "OP-23", "OP-24", "OP-25", "OP-27",
)
def op09_14_scalar_repair_suite(spark, sf_dir):
    """r6 window-slot economy (the op03_08/op05_19 merge applied again):
    the predicate suite and the repair/parse projection union-folded into
    one kind-tagged driver row, freeing a slot for the x84 r6-operator
    suite. Members stay registered (op09_11 at tier 1 keeps ITS members'
    composition; op12_14 keeps the full-fidelity column names)."""
    z = F.lit(0).cast("long")
    pred = op09_11_predicate_suite(spark, sf_dir).select(
        F.concat(F.lit("p_"), F.col("kind")).alias("kind"),
        F.col("id").cast("long").alias("id"),
        F.col("v").cast("long").alias("v1"),
        z.alias("v2"), z.alias("v3"), z.alias("v4"), z.alias("v5"),
        "s1", "s2",
    )
    rep = op12_14_repair_parse(spark, sf_dir).select(
        F.lit("repair").alias("kind"),
        F.col("event_id").cast("long").alias("id"),
        F.col("resolved_id").cast("long").alias("v1"),
        F.col("user_or_default").cast("long").alias("v2"),
        F.col("repaired_us").cast("long").alias("v3"),
        F.col("k").cast("long").alias("v4"),
        F.col("round_trip").cast("long").alias("v5"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
    )
    return pred.unionAll(rep)


@register(
    "op16_17_lookup_join_suite",
    f"""SELECT 'bcast' AS kind, o_orderkey AS id, c_name AS s1,
              NULL AS s2, o_totalprice AS v
       FROM ({member_oracle('op16_broadcast_lookup_join')})
       UNION ALL
       SELECT 'dict', n_nationkey, n_name, region_name, 0.0
       FROM ({member_oracle('op17_dict_lookup_join')})""",
    "OP-16", "OP-17",
)
def op16_17_lookup_join_suite(spark, sf_dir):
    """Driver-verified consolidation of the broadcast-lookup micro-queries
    (window-slot economy, VERDICT r4 item 4): OP-16 Map-build/probe
    broadcast join (op16_broadcast_lookup_join) and OP-17 dictionary
    lookup join (op17_dict_lookup_join), kind-tagged. Members stay tier-1
    standalone; their broadcast plans remain pinned in tests/test_plans.py."""
    bc = op16_broadcast_lookup_join(spark, sf_dir).select(
        F.lit("bcast").alias("kind"),
        F.col("o_orderkey").alias("id"),
        F.col("c_name").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("o_totalprice").alias("v"),
    )
    dc = op17_dict_lookup_join(spark, sf_dir).select(
        F.lit("dict").alias("kind"),
        F.col("n_nationkey").alias("id"),
        F.col("n_name").alias("s1"),
        F.col("region_name").alias("s2"),
        F.lit(0.0).alias("v"),
    )
    return bc.unionAll(dc)


@register(
    "op19_max_id",
    "SELECT CAST(max(o_orderkey) + 1 AS BIGINT) AS next_id FROM orders",
    "OP-19", "OP-06",
    tier=1,
)
def op19_max_id(spark, sf_dir):
    """OP-19/OP-06 (queries.mjs:15, index.mjs:120-126): top-1 id as max();
    +1 is the sequence-restart value the sink post-hook would apply."""
    return max_id(_t(spark, sf_dir, "orders"), "o_orderkey").select(
        (F.col("max_id") + 1).cast("long").alias("next_id")
    )


# --------------------------------------------------------------------------
# §2.1/§2.2 consolidation suites — the micro scan/sink queries, merged so
# their driver rows free window slots for the r5 extension families (the
# x49/x50/x65 trick applied to the fixture ops). The standalone members
# stay registered at tier 1: they keep their plan-contract pins (op03's
# range exchange, op08's pruned ReadSchema) and local oracle rows.
# --------------------------------------------------------------------------

@register(
    "op03_08_scan_suite",
    """SELECT 'sorted' AS kind, event_id AS id1, user_id AS id2,
              event_type AS s1, CAST(0 AS BIGINT) AS v1
       FROM events
       UNION ALL
       SELECT 'renamed', event_id, user_id, event_type, epoch_us(ts)
       FROM events""",
    "OP-01", "OP-02", "OP-03", "OP-08",
)
def op03_08_scan_suite(spark, sf_dir):
    """OP-01/02/03/08 driver row: the full sorted scan (op03) and the
    rename projection (op08) union-folded into one kind-tagged shape.
    The global sort is semantically order-only, so the driver's
    order-insensitive hash sees the same rows either way; the standalone
    tier-1 op03 pins the rangepartitioning exchange in tests."""
    e = _t(spark, sf_dir, "events")
    sorted_scan = e.orderBy("user_id", "event_id").select(
        F.lit("sorted").alias("kind"),
        F.col("event_id").cast("long").alias("id1"),
        F.col("user_id").cast("long").alias("id2"),
        F.col("event_type").alias("s1"),
        F.lit(0).cast("long").alias("v1"),
    )
    renamed = e.select(
        F.lit("renamed").alias("kind"),
        F.col("event_id").cast("long").alias("id1"),
        F.col("user_id").cast("long").alias("id2"),
        F.col("event_type").alias("s1"),
        F.unix_micros("ts").alias("v1"),
    )
    return sorted_scan.unionAll(renamed)


@register(
    "op05_19_sink_suite",
    """SELECT 'dedup' AS kind, l_partkey AS v1, l_suppkey AS v2
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       UNION ALL
       SELECT 'next_id', CAST(max(o_orderkey) + 1 AS BIGINT), CAST(0 AS BIGINT)
       FROM orders""",
    "OP-05", "OP-06", "OP-19",
)
def op05_19_sink_suite(spark, sf_dir):
    """OP-05/06/19 driver row: conflict-key dedup (the queryable core of
    ``ON CONFLICT DO NOTHING``) plus the max+1 sequence-restart scalar,
    kind-tagged in one shape."""
    dedup = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            F.lit("dedup").alias("kind"),
            F.col("l_partkey").cast("long").alias("v1"),
            F.col("l_suppkey").cast("long").alias("v2"),
        )
    )
    next_id = max_id(_t(spark, sf_dir, "orders"), "o_orderkey").select(
        F.lit("next_id").alias("kind"),
        (F.col("max_id") + 1).cast("long").alias("v1"),
        F.lit(0).cast("long").alias("v2"),
    )
    return dedup.unionAll(next_id)


# --------------------------------------------------------------------------
# §2.5 the window showpiece
# --------------------------------------------------------------------------

_OP20_ORACLE = r"""
WITH comments AS (
    SELECT event_id AS id,
           user_id AS video_id,
           repeat('^', CAST(event_id % 4 AS INT)) AS content,
           epoch_us(ts) AS created_us,
           CASE WHEN event_id % 10 = 0
                THEN epoch_us(ts) + (event_id % 3) * 3600000000
                ELSE NULL END AS deleted_us
    FROM events
), walked AS (
    SELECT id, video_id, created_us,
           CAST(length(coalesce(regexp_extract(content, '^(\^+)', 1), '')) AS BIGINT) AS n,
           list(struct_pack(bid := id, bdel := deleted_us))
               OVER (PARTITION BY video_id ORDER BY id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
    FROM comments
)
SELECT id,
       CASE WHEN n >= 1 THEN
           list_reverse(list_filter(prev,
               p -> p.bdel IS NULL OR created_us IS NULL
                    OR p.bdel >= created_us))[CAST(n AS INT)].bid
       ELSE NULL END AS response_to
FROM walked
"""


def _op20_comments(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("id"),
        F.col("user_id").alias("video_id"),
        F.repeat(F.lit("^"), (F.col("event_id") % 4).cast("int")).alias("content"),
        F.unix_micros("ts").alias("created_us"),
        F.when(
            F.col("event_id") % 10 == 0,
            F.unix_micros("ts") + (F.col("event_id") % 3) * 3600000000,
        ).alias("deleted_us"),
    )


#: Registered OP-20 lookback bound: the walk is exact whenever caret depth
#: + skipped-deleted predecessors ≤ L. Measured maximum on the fixtures:
#: 8 (sf0.01) / 9 (sf0.1) — carets are bounded at 3 and deletions at 10%,
#: so needing 64 would take ~61 consecutive invisible-deleted predecessors.
OP20_MAX_LOOKBACK = 64


@register("op20_backref_threading", _OP20_ORACLE, "OP-20", "OP-26")
def op20_backref_threading(spark, sf_dir):
    """OP-20 (index.mjs:62-78): temporal-skip backref resolution on
    events-as-comments (id=event_id, partition=user_id, synthesized caret
    prefixes, 10% deletions including the deleted_at==created_at strict-``>``
    edge). Timestamps are walked as int64 micros so Spark and the oracle
    compare identical scalars.

    REGISTERED TIER: the bounded-state scale tier —
    ``resolve_backrefs_scaled(max_lookback=64)``: the JVM window+HOF walk
    with a 64-row frame, O(p·64) state on ANY partition (FIXTURES.md makes
    ``video_id`` zipf-skewed; the unbounded frame is O(p²) on a hot key,
    SURVEY §4). Exact whenever caret depth + skipped deletions ≤ 64 —
    measured max 9 on the fixtures and the driver gate verifies equality
    with the unbounded oracle at sf0.01. The grouped ``applyInPandas`` tier
    (exact-unbounded at O(group) memory) stays registered as
    op20_backref_threading_grouped; all tiers are property-tested equal on
    zipf/hot-key fixtures (tests/test_threading_property.py)."""
    resolved = resolve_backrefs_scaled(
        _op20_comments(spark, sf_dir),
        partition_col="video_id",
        order_col="id",
        content_col="content",
        created_col="created_us",
        deleted_col="deleted_us",
        out_col="response_to",
        max_lookback=OP20_MAX_LOOKBACK,
    )
    return resolved.select("id", F.col("response_to").cast("long").alias("response_to"))


@register("op20_backref_threading_grouped", _OP20_ORACLE, "OP-20", "OP-26", tier=1)
def op20_backref_threading_grouped(spark, sf_dir):
    """OP-20 exact-unbounded scale tier: one Arrow-batched sequential walk
    per group (``applyInPandas``) — O(group) memory with NO lookback bound.
    The choice when a hot key's threads can genuinely reference arbitrarily
    deep history; costs per-group Python dispatch overhead that the bounded
    JVM tier avoids."""
    resolved = resolve_backrefs_scaled(
        _op20_comments(spark, sf_dir),
        partition_col="video_id",
        order_col="id",
        content_col="content",
        created_col="created_us",
        deleted_col="deleted_us",
        out_col="response_to",
    )
    return resolved.select("id", F.col("response_to").cast("long").alias("response_to"))


@register("op20_backref_threading_hof", _OP20_ORACLE, "OP-20", "OP-26", tier=1)
def op20_backref_threading_hof(spark, sf_dir):
    """OP-20 oracle-companion tier: pure window + higher-order functions —
    no Python in the loop (the plan pin tests/test_plans.py asserts zero
    Python operators). Exact unbounded semantics; preferred when no single
    partition key is pathologically hot."""
    resolved = resolve_backrefs(
        _op20_comments(spark, sf_dir),
        partition_col="video_id",
        order_col="id",
        content_col="content",
        created_col="created_us",
        deleted_col="deleted_us",
        out_col="response_to",
    )
    return resolved.select("id", F.col("response_to").cast("long").alias("response_to"))


# --------------------------------------------------------------------------
# §2.8 scalar functions
# --------------------------------------------------------------------------

@register(
    "op21_30_scalar_suite",
    """SELECT p_partkey,
              array_to_string(list_transform(string_split(p_type, ' '),
                                             w -> upper(w)), '|') AS words_upper,
              CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words,
              substring(p_name, 1, 10) AS name_trunc,
              p_brand || '#' || p_type AS brand_type
       FROM part""",
    "OP-21", "OP-22", "OP-29", "OP-30",
)
def op21_30_scalar_suite(spark, sf_dir):
    """The §2.8 scalar-function layer in one projection over part, the way
    the reference applies them (one per-row render pass): OP-21 split by
    separator + OP-29 per-element transform (higher-order, JVM-side) +
    rejoin, OP-22 varchar(30)-style truncation (index.mjs:51-52, here 10),
    OP-30 string concat."""
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.array_join(F.transform(words, lambda w: F.upper(w)), "|").alias("words_upper"),
        F.size(words).cast("long").alias("n_words"),
        F.substring("p_name", 1, 10).alias("name_trunc"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "op22_substring_truncate",
    """SELECT p_partkey, substring(p_name, 1, 10) AS name_trunc FROM part""",
    "OP-22",
    tier=1,
)
def op22_substring_truncate(spark, sf_dir):
    """OP-22 (index.mjs:51-52): varchar(30)-style truncation (here 10)."""
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", F.substring("p_name", 1, 10).alias("name_trunc"))


@register(
    "op23_regex_extract",
    """SELECT p_partkey,
              coalesce(regexp_extract(p_type, '^([a-z]+)', 1), '') AS first_word
       FROM part""",
    "OP-23",
    tier=1,
)
def op23_regex_extract(spark, sf_dir):
    """OP-23 (index.mjs:62): regex group extraction."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.coalesce(F.regexp_extract("p_type", r"^([a-z]+)", 1), F.lit("")).alias(
            "first_word"
        ),
    )


@register(
    "op24_json_parse",
    """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
       FROM events""",
    "OP-24",
    tier=1,
)
def op24_json_parse(spark, sf_dir):
    """OP-24 (index.mjs:25): JSON text → typed value; malformed → NULL."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
    )


@register(
    "op26_ts_compare_filter",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_late
       FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
       GROUP BY user_id""",
    "OP-26",
    tier=1,
)
def op26_ts_compare_filter(spark, sf_dir):
    """OP-26 (index.mjs:71-72): native timestamp comparison, pushed to scan."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_late"))
    )


@register(
    "op27_int_parse",
    """SELECT event_id, TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS round_trip
       FROM events""",
    "OP-27",
    tier=1,
)
def op27_int_parse(spark, sf_dir):
    """OP-27 (index.mjs:99,122): parseInt — string→long, NULL on garbage
    (try_cast keeps ANSI mode non-throwing)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.col("event_id").cast("string").try_cast("long").alias("round_trip")
    )


@register(
    "op28_explode_wordcount",
    """SELECT w AS word, CAST(count(*) AS BIGINT) AS n
       FROM part, UNNEST(string_split(p_type, ' ')) AS t(w)
       GROUP BY w""",
    "OP-28",
    tier=1,
)
def op28_explode_wordcount(spark, sf_dir):
    """OP-28 (index.mjs:37 array flatten): explode + count — the canonical
    flatten-then-aggregate; partial agg keeps the shuffle narrow. (Breadth
    tail: OP-28 is driver-verified via x28_term_doc_freq's explode→count.)"""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "op30_concat",
    """SELECT p_partkey, p_brand || '#' || p_type AS brand_type FROM part""",
    "OP-30",
    tier=1,
)
def op30_concat(spark, sf_dir):
    """OP-30: string concatenation."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.concat_ws("#", "p_brand", "p_type").alias("brand_type")
    )



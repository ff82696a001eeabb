"""decision_support query-family module — split from the monolithic queries.py
(round 6). Registration side effects only; the public registry surface
lives in the package __init__."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bw_new_data_integration_spark import catalog
from bw_new_data_integration_spark.functions import coercion, keys, text, vectors
from bw_new_data_integration_spark.operators import (
    aggregate,
    dedup,
    merge,
    similarity,
    window_ops,
)
from bw_new_data_integration_spark.session import tune_for_oracle_parity  # noqa: F401
from bw_new_data_integration_spark.queries._shared import (  # noqa: F401
    _REGISTRY,
    _ORACLES,
    register,
    registry,
    oracles,
    _t,
    _fanout,
    _collect_capped,
    _SHINGLE_SQL,
    _minhash_select_sql,
    _lsh_oracle,
    _BOILER_TEXT,
    _capped_lsh_oracle,
    _simhash_oracle,
    _dot_sql,
    _COS_SQL,
    _STOPWORD_LIST_SQL,
    _lang_id_oracle,
    _PIPELINES_YAML,
    _pipeline,
    _lsh_topk_oracle,
    _lsh_multiprobe_oracle,
    _xmla_cube_fixture,
    _IVF_COS_CENT,
    _near_dup_lsh_oracle,
    _TOKS_SQL,
    _cluster_oracle,
    _dedup_e2e_oracle,
    _profile_cols,

)



# ---------------------------------------------------------------------------
# As-of join (engine extension; the reference has only equi-joins):
# every probe event matched to the most recent quote event at or
# before it, per user. Oracle = DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------
@register(
    "j5_asof_join",
    oracle="""
WITH quotes AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts::TIMESTAMP AS ts, CAST(value AS DOUBLE) AS value,
           row_number() OVER (PARTITION BY user_id, ts::TIMESTAMP ORDER BY event_id DESC) AS rn
    FROM events WHERE event_id % 5 = 0
  ) WHERE rn = 1
),
probes AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM events WHERE event_id % 5 <> 0
)
SELECT p.user_id, p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS probe_ts,
       strftime(q.ts, '%Y-%m-%d %H:%M:%S.%f') AS quote_ts,
       q.value AS quote_value
FROM probes p ASOF LEFT JOIN quotes q
  ON p.user_id = q.user_id AND p.ts >= q.ts
""",
)
def j5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each left row matched to the latest right row at-or-before its timestamp."""
    from bw_new_data_integration_spark.operators.asof import asof_join
    from bw_new_data_integration_spark.operators.merge import dedupe_latest

    ev = _t(spark, sf_dir, "events")
    quotes = dedupe_latest(
        ev.filter(F.col("event_id") % 5 == 0).select(
            "user_id", "ts", F.col("value").cast("double").alias("value"), "event_id"
        ),
        ["user_id", "ts"],
        ["event_id"],  # same tie-break as the oracle: keep max event_id
    ).drop("event_id")
    probes = ev.filter(F.col("event_id") % 5 != 0).select("user_id", "ts", "event_id")
    joined = asof_join(probes, quotes, on=["user_id"], value_cols=["value"])
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", fmt).alias("probe_ts"),
        F.date_format("asof_ts", fmt).alias("quote_ts"),
        F.col("asof_value").alias("quote_value"),
    )


# ---------------------------------------------------------------------------
# Range/interval self-join, bucketed (engine extension): per-event
# count of same-user events in the trailing 5 minutes. The bucketed
# equi-join replaces the theta-join cross product; the oracle runs the
# naive predicate directly.
# ---------------------------------------------------------------------------
@register(
    "j6_range_join_counts",
    oracle="""
SELECT e.user_id, e.event_id, COUNT(r.event_id) AS n_preceding
FROM events e LEFT JOIN events r
  ON e.user_id = r.user_id
  AND CAST(floor(epoch(r.ts::TIMESTAMP)) AS BIGINT)
      BETWEEN CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT) - 300
          AND CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT)
  AND r.event_id <> e.event_id
GROUP BY e.user_id, e.event_id
""",
)
def j6_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: count events falling in value intervals (bucketed to avoid the cross product)."""
    from bw_new_data_integration_spark.operators.range_join import count_preceding_events

    ev = _t(spark, sf_dir, "events")
    return count_preceding_events(ev, window_seconds=300)


# ---------------------------------------------------------------------------
# Hypertable-style rollup hierarchy: 1-minute partials rolled up to
# 1 hour WITHOUT rescanning raw data; the oracle aggregates raw events
# at the hour directly — equality proves partial-reuse correctness.
# ---------------------------------------------------------------------------
@register(
    "rollup_hierarchy",
    oracle="""
SELECT strftime(to_timestamp(CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600 * 3600), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a dimension hierarchy with grouping-level labels."""
    ev = _t(spark, sf_dir, "events")
    minute = aggregate.time_rollup(ev, "ts", 60, ["event_type"])
    hour = aggregate.rollup_up(minute, 3600, ["event_type"])
    return hour.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# A6 — grouping sets (engine capability past the reference's discarded
# rollup rows): per-(status,priority), per-status, and grand total in
# one pass, disambiguated by grouping level.
# ---------------------------------------------------------------------------
@register(
    "a6_grouping_sets",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS o_orderstatus,
       COALESCE(o_orderpriority, '<all>') AS o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
)
def a6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS aggregate over chosen dimension combinations."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
SELECT COALESCE(o_orderstatus, '<all>') AS o_orderstatus,
       COALESCE(o_orderpriority, '<all>') AS o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_total
FROM __orders_gs
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""
    )


# ---------------------------------------------------------------------------
# A7 — exact percentiles + distinct counts (engine capability; linear
# interpolation matches quantile_cont bit-for-bit).
# ---------------------------------------------------------------------------
@register(
    "a7_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS med_total,
       quantile_cont(o_totalprice, 0.9) AS p90_total,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderstatus
""",
)
def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (median/p90) with deterministic interpolation."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("med_total"),
        F.percentile("o_totalprice", 0.9).alias("p90_total"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# A9 — approx percentile sketch: the single-pass mergeable-state twin
# of a7's exact percentiles (the 100 TB default — exact percentile
# needs the full value multiset per group; the GK/KLL sketch is fixed
# size and merges associatively). The estimate itself can vary with
# partition merge order, so the gate follows the a8 error-bound
# pattern: the hashed output carries the DETERMINISTIC pieces (exact
# rank-neighborhood bounds) plus a boolean asserting the sketch landed
# inside its guaranteed rank-error window — true under ANY merge order.
# ---------------------------------------------------------------------------
@register(
    "a9_approx_percentile_sketch",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.45) AS p50_lo,
       quantile_cont(o_totalprice, 0.55) AS p50_hi,
       TRUE AS p50_within_bound,
       TRUE AS p90_within_bound
FROM orders GROUP BY o_orderstatus
""",
)
def a9_approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx sketch, error-bounded against exact."""
    o = _t(spark, sf_dir, "orders")
    # accuracy 100 -> guaranteed rank error <= 1/100; gate against the
    # exact values at p +/- 0.05 (stricter than the 0.01 guarantee by
    # 5x slack, so the boolean is stable under any partition layout)
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.45).alias("p50_lo"),
        F.percentile("o_totalprice", 0.55).alias("p50_hi"),
        F.percentile_approx("o_totalprice", 0.5, 100).alias("__p50a"),
        F.percentile_approx("o_totalprice", 0.9, 100).alias("__p90a"),
        F.percentile("o_totalprice", 0.85).alias("__p90_lo"),
        F.percentile("o_totalprice", 0.95).alias("__p90_hi"),
    ).select(
        "o_orderstatus",
        "p50_lo",
        "p50_hi",
        F.col("__p50a").between(F.col("p50_lo"), F.col("p50_hi")).alias("p50_within_bound"),
        F.col("__p90a").between(F.col("__p90_lo"), F.col("__p90_hi")).alias("p90_within_bound"),
    )


# ---------------------------------------------------------------------------
# Q3 shape — big-big join (orders x lineitem, sort-merge) + broadcast
# dim filter + ranked top-k: the canonical "shipping priority" report.
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
WITH rev AS (
  SELECT l.l_orderkey,
         CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l.l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
         strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
         o.o_orderpriority
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_19'
    AND CAST(o.o_orderdate AS DATE) < DATE '1997-06-01'
    AND CAST(l.l_shipdate AS DATE) > DATE '1997-06-01'
  GROUP BY 1, 3, 4
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rk FROM rev
)
SELECT l_orderkey, revenue, o_orderdate, o_orderpriority, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q3: unshipped-order revenue by priority (top-10)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    disc_price = (
        F.col("l_extendedprice").cast("decimal(14,6)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
    )
    rev = (
        li.filter(F.col("l_shipdate").cast("date") > "1997-06-01")
        .join(  # big-big: sort-merge on orderkey
            o.filter(F.col("o_orderdate").cast("date") < "1997-06-01"),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.filter(F.col("n_name") == "NATION_19")), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "l_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(disc_price).cast("decimal(38,6)").cast("double").alias("revenue"))
    )
    # global top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition partial top-k, no single-partition window shuffle);
    # the rank column is derived on the 10 survivors only
    order = [F.col("revenue").desc(), F.col("l_orderkey").asc()]
    top = rev.orderBy(*order).limit(10)
    ranked = top.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
    return ranked.select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority", F.col("rk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# Q5 shape — five-way join (two big-big hops + broadcast dims) with a
# region slice: "local supplier volume" per nation.
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l.l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1997
GROUP BY 1
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q5: revenue where customer and supplier share a nation, by nation."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc_price = (
        F.col("l_extendedprice").cast("decimal(14,6)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
    )
    return (
        c.join(o.filter(F.year("o_orderdate") == 1997), c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(disc_price).cast("decimal(38,6)").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7-shape — volume shipping between two nations: the 6-way join
# (lineitem ⋈ supplier ⋈ orders ⋈ customer ⋈ nation×2) with the
# nation pair filter pushed into both broadcast dimensions BEFORE the
# fact joins — the fact table is reduced by the supplier-nation
# semi-join first, so only qualifying rows reach the big orders join.
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l_discount AS DECIMAL(8,6)) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY 1, 2, 3
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q7: cross-nation shipping volume by year for a nation pair."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(14,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    # Only the nation dimension (fixed 25 rows) is broadcast-hinted:
    # supplier and customer grow with SF, so their join strategy is
    # left to AQE (broadcast while small, shuffle join at scale). The
    # nation-pair filter still reduces both before the fact joins.
    joined = (
        li.join(s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")),
                li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")),
              o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("l_year"),
    ).agg(
        F.sum(volume).cast("decimal(38,6)").cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q10-shape — returned-item reporting: revenue lost to returns per
# customer, global top-20. orderBy+limit compiles to
# TakeOrderedAndProject (per-partition top-k, tiny final merge) —
# never a full global sort.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
WITH rev AS (
  SELECT c_custkey, c_name,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1, 2
)
SELECT c_custkey, c_name, revenue
FROM rev ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q10: top customers by returned-item revenue in a quarter."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    volume = F.col("l_extendedprice").cast("decimal(14,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    # customer grows with SF — no broadcast hint; AQE picks the
    # strategy per actual size
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(volume).cast("decimal(38,6)").cast("double").alias("revenue"))
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


# ---------------------------------------------------------------------------
# Q14-shape — promo revenue share in one month: conditional exact-
# decimal sums in a single pass, ratio taken in double at the end.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN v ELSE CAST(0 AS DECIMAL(23,12)) END) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
       CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue,
       100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN v ELSE CAST(0 AS DECIMAL(23,12)) END) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) AS promo_pct
FROM (
  SELECT p.p_type,
         CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l_discount AS DECIMAL(8,6)) AS v
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
    AND CAST(l_shipdate AS DATE) < DATE '1995-10-01'
)
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q14: promotional revenue share in a month."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1995-10-01"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    v = F.col("l_extendedprice").cast("decimal(14,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", v.alias("v")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("v")).otherwise(
            F.lit(0).cast("decimal(23,12)")
        )
    ).cast("decimal(38,6)").cast("double")
    total = F.sum("v").cast("decimal(38,6)").cast("double")
    return joined.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        (F.lit(100.0) * promo / total).alias("promo_pct"),
    )


# ---------------------------------------------------------------------------
# Q19-shape — disjunctive join predicate (OR of brand/size/quantity
# conjunctions): the optimizer stress-case. Catalyst extracts the
# common p_partkey equi-key, pushes the part-only conjuncts
# (brand, size) into the dimension scan via CNF conversion, and leaves
# the cross-table residual on the join — the fact side is never
# expanded. exact decimal revenue as everywhere.
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 45)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q19: revenue under disjunctive brand/container/quantity predicates."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 45))
    )
    rev = F.col("l_extendedprice").cast("decimal(14,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    return j.filter(cond).agg(
        F.count("*").alias("n_lines"),
        F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A10 — per-store daily sales trend: least-squares slope computed from
# EXACT decimal sums (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — one double
# division, so both engines agree bit-for-bit where built-in
# regr_slope (covariance/variance in floating point) would not. x is
# days since epoch, y the day's sales total.
# ---------------------------------------------------------------------------
@register(
    "a10_sales_trend_per_store",
    oracle="""
WITH daily AS (
  SELECT l_suppkey AS store, date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS x,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS y
  FROM lineitem GROUP BY 1, 2
),
s AS (
  SELECT store, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS DECIMAL(38,6)) AS sy,
         CAST(SUM(x * y) AS DECIMAL(38,6)) AS sxy
  FROM daily GROUP BY store
)
SELECT store, n,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                 / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope
FROM s
""",
)
def a10_sales_trend_per_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-store sales trend: windowed period-over-period delta and running total."""
    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            F.col("l_suppkey").alias("store"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1990-01-01").cast("date")).alias("x"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .alias("y")
        )
    )
    s = daily.groupBy("store").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("bigint") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,6)").alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        (F.col("n") * F.col("sxy").cast("double") - F.col("sx") * F.col("sy").cast("double"))
        / denom.cast("double"),
    )
    return s.select("store", "n", slope.alias("slope"))


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-side filter + single exact
# aggregate; the whole plan is one pushed-predicate scan.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1994-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q6: revenue change from a quantity/discount band over one year."""
    li = _t(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    filt = li.filter(
        (d >= F.lit("1994-01-01"))
        & (d < F.lit("1995-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(14,6)") * F.col("l_discount").cast(
        "decimal(8,6)"
    )
    return filt.agg(
        F.count("*").alias("n_lines"),
        F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Q4 (adapted: the fixture lacks commit/receipt dates — "late" is a
# ship >60 days after order) — priority check via EXISTS: left-semi
# join with a non-equi component, orders scanned once.
# ---------------------------------------------------------------------------
@register(
    "q4_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q4: order-priority counts with a late-lineitem EXISTS filter."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    o = o.filter((d >= F.lit("1996-01-01")) & (d < F.lit("1996-04-01")))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate.cast("date") > F.date_add(F.col("o_orderdate").cast("date"), 60)),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# Q8 (adapted: PROMO parts, EUROPE market) — national market share:
# two broadcast dimension chains (customer->nation->region and
# supplier->nation) around one fact join; share = conditional exact
# sum / exact sum, one division per year.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
WITH base AS (
  SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(14,6)) * CAST(1 - l.l_discount AS DECIMAL(8,6)) AS v,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN v ELSE CAST(0 AS DECIMAL(23,12)) END) AS DECIMAL(38,6)) AS DOUBLE)
         / CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q8: nation market share within region by year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date").between("1995-01-01", "1996-12-31")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    v = F.col("l_extendedprice").cast("decimal(14,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("o_year"),
            v.alias("v"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("v")).otherwise(
            F.lit(0).cast("decimal(23,12)")
        )
    ).cast("decimal(38,6)").cast("double")
    den = F.sum("v").cast("decimal(38,6)").cast("double")
    return base.groupBy("o_year").agg((num / den).alias("mkt_share"))


# ---------------------------------------------------------------------------
# Q13 (adapted: priority filter stands in for the comment NOT LIKE) —
# customer order-count distribution: left outer join preserving
# order-less customers, then a second aggregation over the counts.
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q13: distribution of customers by order count (left join)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q21 (adapted: no receipt/commit dates — the "blocking" supplier is
# the order's unique latest shipper) — suppliers who kept F-status
# multi-supplier orders waiting: one semi-join (another supplier
# exists) and one anti-join (no other supplier shipped later),
# composed on the same orderkey equi-key.
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders o ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND CAST(l3.l_shipdate AS DATE) > CAST(l1.l_shipdate AS DATE)
  )
GROUP BY s.s_name
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q21: suppliers who kept multi-supplier orders waiting (EXISTS/NOT EXISTS)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    l1 = li.alias("l1").join(o, F.col("l1.l_orderkey") == o.o_orderkey, "leftsemi")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    ).alias("l2")
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    ).alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2"))
            & (F.col("l1.l_suppkey") != F.col("sk2")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3"))
            & (F.col("l1.l_suppkey") != F.col("sk3"))
            & (F.col("sd3").cast("date") > F.col("l1.l_shipdate").cast("date")),
            "leftanti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "leftsemi")
    )
    return waiting.groupBy("s_name").agg(F.count("*").alias("numwait"))


# ---------------------------------------------------------------------------
# Q22 (adapted: cntrycode = c_custkey % 7 — the fixture has no phone
# column) — dormant high-balance customers: scalar-anchor average
# (collected 1-row aggregate, inlined as a literal), anti-join against
# orders placed since the dormancy cutoff (every fixture customer has
# SOME order, so plain q22 dormancy would be vacuous).
# ---------------------------------------------------------------------------
@register(
    "q22_dormant_customers",
    oracle="""
WITH pool AS (
  SELECT c_custkey, c_acctbal, CAST(c_custkey % 7 AS BIGINT) AS cntrycode
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
),
avg_bal AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS DOUBLE)
         / COUNT(*) AS a
  FROM pool WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS DOUBLE) AS totacctbal
FROM pool, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey
                  AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY cntrycode
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q22: dormant customers above-average balance with no orders (anti join)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pool = c.filter((F.col("c_custkey") % 7).isin(1, 3, 5)).withColumn(
        "cntrycode", (F.col("c_custkey") % 7).cast("bigint")
    )
    # scalar anchor: the average is one number; inline it as a literal
    # (the same exact-sum/count division as the oracle) instead of a
    # cross join the planner would have to carry
    row = (
        pool.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("s"),
            F.count("*").alias("n"),
        )
        .first()
    )
    avg_bal = row["s"] / row["n"]
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01")
    ).select("o_custkey")
    dormant = pool.filter(F.col("c_acctbal") > avg_bal).join(
        o, pool.c_custkey == o.o_custkey, "leftanti"
    )
    return dormant.groupBy("cntrycode").agg(
        F.count("*").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(27,6)"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# Q2 (adapted: the fixture has no partsupp — observed lineitem
# part×supplier pairs ARE the catalog, and "supply cost" is the exact
# per-pair revenue total) — minimum-cost supplier per part in a
# region: a correlated-min subquery re-expressed as agg + min-per-key
# + equality join back, all dims broadcast.
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,6))) AS DECIMAL(38,6)) AS cost
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey
),
mn AS (SELECT l_partkey AS mk, MIN(cost) AS mincost FROM ps GROUP BY l_partkey)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
       CAST(ps.cost AS DOUBLE) AS supply_cost
FROM ps
JOIN mn ON ps.l_partkey = mn.mk AND ps.cost = mn.mincost
JOIN part p ON ps.l_partkey = p.p_partkey AND p.p_size = 25
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q2: minimum-cost supplier per part via correlated min subquery."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "leftsemi")
        .select("s_suppkey")
    )
    ps = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey, "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(14,6)"))
            .cast("decimal(38,6)")
            .alias("cost")
        )
    )
    mn = ps.groupBy(F.col("l_partkey").alias("mk")).agg(F.min("cost").alias("mincost"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 25).select("p_partkey")
    return (
        ps.join(mn, (ps.l_partkey == mn.mk) & (ps.cost == mn.mincost))
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 (adapted: no partsupp supply cost — unit cost proxied as 60% of
# p_retailprice, exact decimal) — product-type profit by supplier
# nation and order year: the widest dimension chain in the family
# (lineitem->orders + part + supplier->nation), revenue and cost
# accumulated as SEPARATE exact sums and differenced once per group.
# ---------------------------------------------------------------------------
@register(
    "q9_product_type_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,6))
                     * CAST(1 - l.l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE)
       - CAST(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(14,6))
                       * CAST(l.l_quantity AS DECIMAL(14,6))
                       * CAST(0.6 AS DECIMAL(2,1))) AS DECIMAL(38,6)) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%bolt%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY nation, o_year
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q9: profit by nation and year for a product line."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(14,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    cost = (
        F.col("p_retailprice").cast("decimal(14,6)")
        * F.col("l_quantity").cast("decimal(14,6)")
        * F.lit(0.6).cast("decimal(2,1)")
    )
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("o_year"),
            revenue.alias("rev"),
            cost.alias("cost"),
        )
    )
    return base.groupBy("nation", "o_year").agg(
        (
            F.sum("rev").cast("decimal(38,6)").cast("double")
            - F.sum("cost").cast("decimal(38,6)").cast("double")
        ).alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# Q11 (adapted: no partsupp availqty — a part's "stock value" is the
# exact revenue total its NATION_1 suppliers shipped) — important
# stock: grouped exact sums gated by a scalar-anchor threshold
# (collected once, inlined as a literal, q22 discipline). TPC-H's
# fraction is 0.0001/SF — scale-dependent; here the threshold is
# 2.5x the per-part mean, which keeps the same selectivity at every
# SF (a fixed fraction of the grand total empties out as the part
# count grows).
# ---------------------------------------------------------------------------
@register(
    "q11_important_stock",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey,
         CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,6))) AS DECIMAL(38,6)) AS DOUBLE) AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_1'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value FROM ps
WHERE value > (SELECT SUM(CAST(value AS DECIMAL(27,6)))::DECIMAL(38,6)::DOUBLE
                      / COUNT(*) * 2.5 FROM ps)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q11: stock value groups above a scaled national threshold (HAVING)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "leftsemi").select(
        "s_suppkey"
    )
    ps = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey, "leftsemi")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(14,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("value")
        )
    )
    # scalar anchor: total and count are two numbers; the threshold is
    # computed with the SAME operand order on both engines (exact
    # decimal sum of the per-part doubles -> double, / count, * 2.5 —
    # each step IEEE double)
    row = ps.agg(
        F.sum(F.col("value").cast("decimal(27,6)")).cast("decimal(38,6)").cast("double").alias("t"),
        F.count("*").alias("n"),
    ).first()
    # SUM over zero rows is NULL — the threshold only gates rows that
    # exist, so an empty relation's anchor can be anything finite
    threshold = 0.0 if row["t"] is None else row["t"] / row["n"] * 2.5
    return ps.filter(F.col("value") > threshold).select("l_partkey", "value")


# ---------------------------------------------------------------------------
# Q12 (adapted: no shipmode/commit/receipt dates — "late" is shipdate
# > orderdate + 60 days and the mode axis is l_linestatus) — priority
# mix of late shipments: the conditional-CASE-sum pair over one fact
# join, integer outputs.
# ---------------------------------------------------------------------------
@register(
    "q12_late_shipment_priority",
    oracle="""
SELECT l.l_linestatus AS ship_class,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
  AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY ship_class
""",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q12: late shipments split by order-priority class per ship mode."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    sd = F.col("l_shipdate").cast("date")
    li = li.filter((sd >= F.lit("1996-01-01")) & (sd < F.lit("1997-01-01")))
    joined = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        sd > F.date_add(F.col("o_orderdate").cast("date"), 60)
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy(F.col("l_linestatus").alias("ship_class")).agg(
        F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# Q15 (adapted filters only) — top supplier by quarterly revenue: the
# view-then-max-equality shape; the max is a scalar anchor collected
# as an exact DECIMAL and matched by decimal equality (bit-stable —
# no double compare in the gate).
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6))
                  * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS total_rev
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(rev.total_rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q15: top supplier(s) by quarterly revenue vs the max (view + tie)."""
    li = _t(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    rev = (
        li.filter((sd >= F.lit("1996-01-01")) & (sd < F.lit("1996-04-01")))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,6)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
            )
            .cast("decimal(38,6)")
            .alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("m")).first()["m"]
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.filter(F.col("total_rev") == F.lit(top))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q16 (adapted: the part-supplier relation is the DISTINCT observed
# lineitem pairs; "complaint" suppliers are those with negative
# account balance) — supplier counts per part profile: NOT-IN
# anti-join + exclusion predicates + count-distinct over the pair
# relation.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q16: supplier counts per part attribute excluding flagged suppliers."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(complaints), ps.l_suppkey == complaints.s_suppkey, "leftanti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 (adapted: no partsupp availqty — a supplier "holds excess
# stock" of a part when their 1996 shipped quantity exceeds half that
# part's 1996 total) — part-promotion candidates in one nation:
# nested-IN composition re-expressed as exact-sum aggs + threshold
# join + two semi-joins.
# ---------------------------------------------------------------------------
@register(
    "q20_part_promotion",
    oracle="""
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(14,6))) AS DECIMAL(38,6)) AS supp_qty
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
tq AS (SELECT l_partkey AS tk, SUM(supp_qty) AS total_qty FROM sq GROUP BY l_partkey)
SELECT DISTINCT s.s_name
FROM sq
JOIN tq ON sq.l_partkey = tq.tk
JOIN part p ON sq.l_partkey = p.p_partkey AND p.p_name LIKE 'small%'
JOIN supplier s ON sq.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
WHERE CAST(sq.supp_qty AS DOUBLE) > CAST(tq.total_qty AS DOUBLE) * 0.5
""",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q20: suppliers holding excess stock of promoted parts (semi joins)."""
    li = _t(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    sq = (
        li.filter((sd >= F.lit("1996-01-01")) & (sd < F.lit("1997-01-01")))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(14,6)"))
            .cast("decimal(38,6)")
            .alias("supp_qty")
        )
    )
    tq = sq.groupBy(F.col("l_partkey").alias("tk")).agg(F.sum("supp_qty").alias("total_qty"))
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5").select("n_nationkey")
    return (
        sq.join(tq, sq.l_partkey == tq.tk)
        .filter(
            F.col("supp_qty").cast("double") > F.col("total_qty").cast("double") * F.lit(0.5)
        )
        .join(F.broadcast(p), sq.l_partkey == p.p_partkey, "leftsemi")
        .join(F.broadcast(s), sq.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "leftsemi")
        .select("s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Semi-join: customers having 1997 orders (left_semi — probe existence,
# never duplicates the left side).
# ---------------------------------------------------------------------------
@register(
    "j7_semi_join",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1997)
GROUP BY 1
""",
)
def j7_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: orders having at least one matching high-value lineitem."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    active = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return (
        c.join(active, c.c_custkey == active.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# O9 — the full ranking-function family over one window (row_number,
# rank, dense_rank, percent_rank, cume_dist, ntile, lag/lead), with a
# deterministic total order (ties broken by orderkey) so every engine
# agrees bit-for-bit. percent_rank/cume_dist are rational (rank-1)/
# (n-1) and rank/n divisions — single exact divisions of integers.
# ---------------------------------------------------------------------------
@register(
    "o9_rank_family",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       lag(o_orderkey, 1) OVER w AS prev_order,
       lead(o_orderkey, 1) OVER w AS next_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def o9_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking family: rank, dense_rank, percent_rank, ntile over one ordered window."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
    )


# ---------------------------------------------------------------------------
# O4 — moving average over a rows frame (last 3 orders per customer),
# exact decimal arithmetic for cross-engine determinism.
# ---------------------------------------------------------------------------
@register(
    "o4_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / CAST(COUNT(*)
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS moving_avg
FROM orders
""",
)
def o4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over an ordered row window per key."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# O5 — set operations: EXCEPT ALL / INTERSECT ALL over key sets.
# ---------------------------------------------------------------------------
@register(
    "o5_set_ops",
    oracle="""
WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
     b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
     only_a AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b),
     both_ab AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
SELECT 'except_all' AS op, COUNT(*) AS n FROM only_a
UNION ALL
SELECT 'intersect_all' AS op, COUNT(*) AS n FROM both_ab
""",
)
def o5_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT / EXCEPT between two derived keysets."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    ex = a.exceptAll(b).agg(F.count("*").alias("n")).select(F.lit("except_all").alias("op"), "n")
    ins = (
        a.intersectAll(b).agg(F.count("*").alias("n")).select(F.lit("intersect_all").alias("op"), "n")
    )
    return ex.unionByName(ins)


# ---------------------------------------------------------------------------
# J8 — anti-join: customers with NO 1997 orders, counted per nation.
# The reference has no anti-join (SURVEY.md §2.5 notes J2-J4 are its only
# join shapes); this completes the semi/anti pair next to j7. left_anti
# never duplicates or widens the probe side, and the nation dimension is
# broadcast — at 100 TB the only shuffle is customer-vs-orders on custkey.
# ---------------------------------------------------------------------------
@register(
    "j8_anti_join",
    oracle="""
SELECT n.n_name, COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1997
)
GROUP BY 1
""",
)
def j8_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    active = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return (
        c.join(active, c.c_custkey == active.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar subquery: revenue from small-quantity
# orders of one brand's parts (quantity below 20% of that part's mean).
# Scale plan: the brand filter is BROADCAST into lineitem FIRST, so the
# per-part threshold aggregate runs over the ~1/brand-count slice, not
# the full fact table; the threshold table (one row per qualifying part)
# is then broadcast back. No full-fact shuffle anywhere.
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH thr AS (
  SELECT l.l_partkey,
         CAST(0.2 AS DOUBLE) * (CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                                / CAST(COUNT(l.l_quantity) AS DOUBLE)) AS qty_thr
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23'
  GROUP BY 1
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / CAST(7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN thr t ON t.l_partkey = l.l_partkey
WHERE l.l_quantity < t.qty_thr
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q17: small-quantity revenue vs 0.2x per-part average (correlated avg)."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    brand_li = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    thr = (
        brand_li.groupBy("l_partkey")
        .agg((F.lit(0.2) * aggregate.exact_avg("l_quantity")).alias("qty_thr"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    small = brand_li.join(
        F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey")
    ).filter(F.col("l_quantity") < F.col("qty_thr"))
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Q18 shape — HAVING over a grouped fact (large-quantity orders), then
# joined back to orders + customer. The HAVING filter collapses the fact
# to a tiny key set, so AQE converts both downstream joins to broadcasts
# at runtime — the only big shuffle is the l_orderkey aggregation, which
# partial-aggregates map-side.
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY 1
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) > 250.0
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-support Q18: customers with orders above a total-quantity threshold."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 250.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# A8 — sketch aggregate: approx_count_distinct (HLL++) side-by-side
# with the exact distinct count, relative error surfaced. At 100 TB an
# exact distinct shuffles the whole key set; the sketch is fixed-size
# per partition and merges by register-max — associative and
# commutative, so it is deterministic under ANY partitioning (the
# determinism sweep runs it at local[4]/5 and local[16]/64). No DuckDB
# oracle: HLL implementations differ per engine, so this entry takes
# the rows-only check and tests/test_invariants.py pins the error
# bound instead.
# ---------------------------------------------------------------------------
@register(
    "a8_approx_distinct_sketch",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
       TRUE AS approx_ok
FROM orders
GROUP BY 1
""",
)
def a8_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch vs exact distinct, gated by an error bound.

    Spark's HLL++ and DuckDB's approx_count_distinct disagree by design,
    so the raw estimate cannot be hash-compared cross-engine. Instead the
    query surfaces the exact count (oracle-checkable) plus the acceptance
    bound ``|approx - exact| / exact <= 0.05`` (2.5 sigma at rsd=0.02) as
    a boolean the oracle pins to TRUE — a deterministic hash gate on the
    sketch's accuracy, not just its row count.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_exact"),
            F.approx_count_distinct("o_custkey", 0.02).alias("n_approx"),
        )
        .select(
            "order_year",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact")).cast("double")
                / F.col("n_exact").cast("double")
                <= F.lit(0.05)
            ).alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel conversion — staged sequence analysis over the event stream:
# users who viewed, then clicked AFTER their first view, then purchased
# AFTER that click. Each stage is a (filter -> groupBy user -> min ts)
# on the same shuffle key, so the exchanges line up; the stage tables
# shrink monotonically and join back user-grained, never event-grained.
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion",
    oracle="""
WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
v AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL SELECT 'click_after_view' AS stage, COUNT(*) AS n_users FROM c
UNION ALL SELECT 'purchase_after_click' AS stage, COUNT(*) AS n_users FROM p
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-funnel conversion rates per step with session scoping."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "view")
        .unionByName(stage(c, "click_after_view"))
        .unionByName(stage(p, "purchase_after_click"))
    )


# ---------------------------------------------------------------------------
# Quantile binning — curriculum-style bucketing by exact decile
# boundaries. Deliberately NOT ntile(): an unpartitioned ranking window
# forces every row into one task, which is exactly what dies at 100 TB.
# Exact percentile is computed distributed, the 9 boundaries broadcast,
# and each row binned by comparison — fully parallel. (Spark
# percentile() is bit-identical to DuckDB quantile_cont.)
# ---------------------------------------------------------------------------
@register(
    "quantile_binning",
    oracle="""
WITH q AS (
  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM documents
)
SELECT CAST(1 + (CASE WHEN n_chars > qs[1] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[2] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[3] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[4] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[5] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[6] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[7] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[8] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > qs[9] THEN 1 ELSE 0 END) AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents, q
GROUP BY 1
""",
)
def quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quantile binning of a numeric column into labeled buckets."""
    docs = _t(spark, sf_dir, "documents")
    probs = [i / 10 for i in range(1, 10)]
    # boundaries collected to the driver (9 doubles) and inlined as
    # literals: the binning pass is then pure column expressions — no
    # join of any kind, and Catalyst can constant-fold/pushdown around
    # the literals. Two jobs total (exact-percentile agg + binned agg);
    # at 100 TB the percentile scan dominates either way, and this
    # removes the broadcast-nested-loop join the one-row-attach pattern
    # needs (formerly a plan-audit allowlist entry).
    qvals = docs.agg(
        F.expr(
            "percentile(n_chars, array({}))".format(",".join(str(p) for p in probs))
        ).alias("qs")
    ).collect()[0]["qs"]
    binned = docs.withColumn(
        "bin",
        sum((F.col("n_chars") > F.lit(float(v))).cast("bigint") for v in qvals)
        + F.lit(1),
    )
    return binned.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "profile_table",
    oracle="""
SELECT 'o_orderkey' AS col_name, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_str, CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
       CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
""",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact table profiling: per-column null/distinct/min/max statistics."""
    from bw_new_data_integration_spark.operators import profiling

    o = _t(spark, sf_dir, "orders")
    return profiling.profile(o, _profile_cols(), approx=False)


# Approx-distinct profile — the 100 TB default: one scan, HLL++ sketches
# through ordinary partial aggregation, no Expand. The estimates cannot be
# hash-compared cross-engine (Spark's HLL++ and DuckDB's
# approx_count_distinct disagree by design), so the query joins the approx
# plan against the exact plan and surfaces the acceptance bound
# ``|approx - exact| / exact <= 0.05`` as a boolean the oracle pins to
# TRUE. The exact join is the acceptance harness only — the production
# profile at 100 TB is the bare ``approx=True`` single-pass plan.
@register(
    "profile_table_approx",
    oracle="""
SELECT 'o_orderkey' AS col_name, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct, TRUE AS approx_ok FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey), TRUE FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus), TRUE FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice), TRUE FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate), TRUE FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority), TRUE FROM orders
""",
)
def profile_table_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based table profiling: approx distinct + percentile per column in one pass."""
    from bw_new_data_integration_spark.operators import profiling

    o = _t(spark, sf_dir, "orders")
    approx = profiling.profile(o, _profile_cols(), approx=True, rsd=0.02).select(
        "col_name", F.col("n_distinct").alias("nd_approx")
    )
    exact = profiling.profile(o, _profile_cols(), approx=False).select(
        "col_name", "n_nulls", "n_distinct"
    )
    return exact.join(F.broadcast(approx), "col_name").select(
        "col_name",
        "n_nulls",
        "n_distinct",
        (
            F.abs(F.col("nd_approx") - F.col("n_distinct")).cast("double")
            / F.col("n_distinct").cast("double")
            <= F.lit(0.05)
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Expectation validation — declarative data-quality rules evaluated in
# one aggregate pass (null-safe: a NULL predicate counts as a
# violation). The reference's F1/F7 validity filters generalized into a
# rule report, the shape a dbt-style test or Delta constraint check
# produces.
# ---------------------------------------------------------------------------
@register(
    "validate_expectations",
    oracle="""
SELECT 'positive_totalprice' AS rule,
       CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       COUNT(*) AS n_checked
FROM orders
UNION ALL
SELECT 'known_status',
       CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*) FROM orders
UNION ALL
SELECT 'orderdate_in_range',
       CAST(SUM(CASE WHEN NOT COALESCE(o_orderdate >= TIMESTAMP '1992-01-01'
                                   AND o_orderdate < TIMESTAMP '2002-01-01', FALSE) THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*) FROM orders
UNION ALL
SELECT 'custkey_not_null',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*) FROM orders
""",
)
def validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations: rule violations counted per constraint."""
    o = _t(spark, sf_dir, "orders")
    rules = {
        "positive_totalprice": F.col("o_totalprice") > 0,
        "known_status": F.col("o_orderstatus").isin("F", "O", "P"),
        "orderdate_in_range": (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp")),
        "custkey_not_null": F.col("o_custkey").isNotNull(),
    }
    exprs = []
    for name, cond in rules.items():
        viol = (~F.coalesce(cond, F.lit(False))).cast("bigint")
        exprs.append(F.sum(viol).cast("bigint").alias(f"v_{name}"))
    exprs.append(F.count("*").alias("n_checked"))
    agg = o.agg(*exprs)
    stack_args = ", ".join(f"'{r}', v_{r}, n_checked" for r in rules)
    return agg.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations, n_checked)"
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time enrichment — the QUERY side of the history-
# preserving dimension: each fact joins the dimension version valid at
# the fact's date (valid_from <= d < valid_to, open-ended current).
# 1996 orders see the original segment; 1997 orders of active-in-1997
# customers see ACTIVE97. Equi-join on the key with the validity range
# as residual predicate — one shuffle, no interval blowup (versions per
# key are few and non-overlapping).
# ---------------------------------------------------------------------------
@register(
    "scd2_point_in_time",
    oracle="""
WITH active97 AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997),
dim AS (SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer),
scd AS (
  SELECT d.custkey, d.segment, DATE '1992-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to
  FROM dim d LEFT JOIN active97 a USING (custkey) WHERE a.custkey IS NULL
  UNION ALL
  SELECT d.custkey, d.segment, DATE '1992-01-01', DATE '1997-01-01'
  FROM dim d JOIN active97 a USING (custkey)
  UNION ALL
  SELECT a.custkey, 'ACTIVE97', DATE '1997-01-01', CAST(NULL AS DATE)
  FROM active97 a
),
facts AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
)
SELECT CAST(year(od) AS BIGINT) AS y, s.segment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_total
FROM facts f JOIN scd s
  ON f.custkey = s.custkey
 AND s.valid_from <= f.od AND (s.valid_to IS NULL OR f.od < s.valid_to)
GROUP BY 1, 2
""",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time lookup: the dimension row valid at a given timestamp."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    dim = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        o.filter(F.year("o_orderdate") == 1997)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .withColumn("segment", F.lit("ACTIVE97"))
        .withColumn("eff", F.lit("1997-01-01").cast("date"))
    )
    scd = merge.scd2_merge(dim, updates, ["custkey"], ["segment"], "eff")
    facts = o.filter(F.year("o_orderdate").isin(1996, 1997)).select(
        F.col("o_custkey").alias("f_custkey"),
        F.col("o_orderdate").cast("date").alias("od"),
        "o_totalprice",
    )
    enriched = merge.point_in_time_lookup(
        facts.withColumnRenamed("f_custkey", "custkey").alias("f"),
        scd.alias("d"),
        ["custkey"],
        "od",
    )
    return enriched.groupBy(
        F.year("od").cast("bigint").alias("y"), F.col("d.segment").alias("segment")
    ).agg(
        F.count("*").alias("n_orders"),
        aggregate.exact_sum("o_totalprice").alias("sum_total"),
    )


# ---------------------------------------------------------------------------
# SCD Type 2 merge — attribute-history-preserving dimension maintenance
# (the pattern the reference's overwrite-upsert cannot express): when a
# tracked attribute changes, the current row is closed at the effective
# date and a new current version appends. Scenario: customers who
# ordered in 1997 move to segment ACTIVE97 effective 1997-01-01.
# ---------------------------------------------------------------------------
@register(
    "scd2_dimension",
    oracle="""
WITH active97 AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997),
dim AS (SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer)
SELECT d.custkey, d.segment, '1992-01-01' AS valid_from,
       CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
FROM dim d LEFT JOIN active97 a USING (custkey) WHERE a.custkey IS NULL
UNION ALL
SELECT d.custkey, d.segment, '1992-01-01', '1997-01-01', FALSE
FROM dim d JOIN active97 a USING (custkey)
UNION ALL
SELECT a.custkey, 'ACTIVE97', '1997-01-01', CAST(NULL AS VARCHAR), TRUE
FROM active97 a
""",
)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build: change detection into validity ranges with current flags."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    dim = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        o.filter(F.year("o_orderdate") == 1997)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .withColumn("segment", F.lit("ACTIVE97"))
        .withColumn("eff", F.lit("1997-01-01").cast("date"))
    )
    out = merge.scd2_merge(dim, updates, ["custkey"], ["segment"], "eff")
    # gate-level parity: dates stringified (pandas represents Spark
    # DateType and DuckDB DATE differently)
    return out.select(
        "custkey",
        "segment",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# O7 — gaps and islands: per-user streaks of consecutive active days.
# The classic (value - row_number) grouping trick; all windows partition
# by user, so the single shuffle is on user_id and every window stays
# within its partition — no global sort anywhere.
# ---------------------------------------------------------------------------
@register(
    "o7_activity_streaks",
    oracle="""
WITH days AS (SELECT DISTINCT user_id, CAST(ts::TIMESTAMP AS DATE) AS d FROM events),
g AS (SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
      FROM days),
streaks AS (SELECT user_id, COUNT(*) AS len FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY 1
""",
)
def o7_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (date - dense_rank grouping)."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = days.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = g.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("max_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


# ---------------------------------------------------------------------------
# O10 — ROLLUP grain generation (round 5): the INVERSE of F2. The
# reference consumed a cube that materializes 'All'-member rollup rows
# and filtered them out; serving-side, this engine can also PRODUCE
# that cube surface: GROUP BY ROLLUP emits every prefix grain
# (nation+year, nation, grand total) in one pass — partial aggregation
# handles all grains in the same shuffle, no per-grain rescan. The
# 'All' marker is spelled exactly like the cube's, so F2
# (drop_rollup_rows) round-trips: applying it to this output restores
# the leaf grain.
# ---------------------------------------------------------------------------
@register(
    "o10_rollup_grains",
    oracle="""
SELECT COALESCE(CAST(c_nationkey AS VARCHAR), 'All') AS nation,
       CASE WHEN GROUPING(year(CAST(o_orderdate AS DATE))) = 1 THEN 'All'
            ELSE CAST(year(CAST(o_orderdate AS DATE)) AS VARCHAR) END AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP(c_nationkey, year(CAST(o_orderdate AS DATE)))
""",
)
def o10_rollup_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain rollup (day/month/year) materialized in one pass with GROUPING ID labels."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").cast("string").alias("nation_raw"),
        F.year(F.col("o_orderdate").cast("date")).cast("string").alias("year_raw"),
        "o_totalprice",
    )
    rolled = joined.rollup("nation_raw", "year_raw").agg(
        F.count("*").alias("n_orders"),
        aggregate.exact_sum("o_totalprice").alias("sum_price"),
        F.grouping("nation_raw").alias("__gn"),
        F.grouping("year_raw").alias("__gy"),
    )
    return rolled.select(
        F.when(F.col("__gn") == 1, "All").otherwise(F.col("nation_raw")).alias("nation"),
        F.when(F.col("__gy") == 1, "All").otherwise(F.col("year_raw")).alias("order_year"),
        "n_orders",
        "sum_price",
    )


# ---------------------------------------------------------------------------
# O11 — gap filling with linear interpolation (round 5): a sparse
# per-user daily series (every 17th event) densified to its observed
# min..max calendar and missing days interpolated. Declarative end to
# end: per-key sequence/explode skeleton, one left join, last/first
# ignore-nulls anchor windows — no self-joins, no driver loop. The
# interpolation expression is written IDENTICALLY on both engines
# (prev + (next - prev) * (d1/d2)) and rounded to 6dp, so the hash
# gate is exact.
# ---------------------------------------------------------------------------
@register(
    "o11_gap_fill_linear",
    oracle="""
WITH sparse AS (
  SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS v
  FROM events WHERE event_id % 17 = 0
  GROUP BY 1, 2
),
span AS (
  SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM sparse GROUP BY 1
),
skeleton AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
  FROM span
),
joined AS (
  SELECT s.user_id, s.d, sp.v FROM skeleton s
  LEFT JOIN sparse sp ON sp.user_id = s.user_id AND sp.d = s.d
),
anchored AS (
  SELECT user_id, d, v,
         last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS pd,
         last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS pv,
         first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
         first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM joined
)
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
       round(COALESCE(v, pv + (nv - pv) * (CAST(date_diff('day', pd, d) AS DOUBLE)
             / CAST(date_diff('day', pd, nd) AS DOUBLE))), 6) AS value,
       v IS NULL AS is_interpolated
FROM anchored
""",
)
def o11_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with linear interpolation between observed points per series."""
    ev = _t(spark, sf_dir, "events")
    sparse = (
        ev.where(F.col("event_id") % 17 == 0)
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(aggregate.exact_sum("value").alias("v"))
    )
    filled = window_ops.fill_gaps_linear(sparse, "d", "v", ["user_id"])
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round("v", 6).alias("value"),
        "is_interpolated",
    )


# ---------------------------------------------------------------------------
# O12 — skyline / Pareto-dominance (operators/skyline.py; EDBT 2023
# "Integration of Skyline Queries into Spark SQL" in PAPERS.md).
# Cheapest-and-smallest parts: no other part is <= on both price and
# size with one strict. The oracle is the definitional NOT EXISTS
# self-join (fine at sf0.01); the engine plan is the O(N log N)
# sort-filter skyline — groupBy + prefix-min window over DISTINCT
# prices, no self-join, no BroadcastNestedLoopJoin.
# ---------------------------------------------------------------------------
@register(
    "o12_skyline_pareto",
    oracle="""
SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS price, CAST(p_size AS BIGINT) AS size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
)
""",
)
def o12_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: Pareto-optimal parts minimizing (retail price, size)."""
    from bw_new_data_integration_spark.operators import skyline

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return skyline.skyline_2d(p, "price", "size")

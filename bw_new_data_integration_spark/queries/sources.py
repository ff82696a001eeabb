"""sources query-family module — split from the monolithic queries.py
(round 6). Registration side effects only; the public registry surface
lives in the package __init__."""

from __future__ import annotations

import os as _os

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



@register(
    "pipeline_daily_sales",
    oracle="""
WITH agg AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS store_number,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS calendar_date,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS base_price_usd,
         CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS discounts_usd,
         CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(27,6))) AS DOUBLE) AS tax_usd,
         CAST(COUNT(*) AS INT) AS line_count
  FROM lineitem
  GROUP BY 1, 2
)
SELECT store_number, calendar_date, qty, base_price_usd, discounts_usd, tax_usd, line_count,
       store_number || '_' || strftime(CAST(calendar_date AS DATE), '%Y%m%d') AS business_key
FROM agg
""",
)
def pipeline_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YAML-mapped daily-sales pipeline: projection, coercion, business key, gates."""
    return _pipeline(spark, sf_dir, "daily_sales")


@register(
    "pipeline_offers",
    oracle="""
WITH agg AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS calendar_date,
         CAST(l_suppkey AS VARCHAR) AS store_number,
         CAST(l_partkey AS VARCHAR) AS offer_code,
         CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS discount_amount_usd,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS net_sales_usd,
         CAST(COUNT(*) AS INT) AS order_count
  FROM lineitem
  GROUP BY 1, 2, 3
)
SELECT calendar_date, store_number, offer_code, discount_amount_usd, net_sales_usd, order_count,
       store_number || '_' || strftime(CAST(calendar_date AS DATE), '%Y%m%d') || '_' || offer_code AS business_key
FROM agg
""",
)
def pipeline_offers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YAML-mapped offers pipeline (reference mapping parity)."""
    return _pipeline(spark, sf_dir, "offers")


@register(
    "pipeline_inventory",
    oracle="""
WITH agg AS (
  SELECT CAST(p_partkey AS VARCHAR) AS item_number,
         p_name AS item_description,
         p_brand AS store_number,
         CAST(SUM(CAST(p_size AS DECIMAL(27,6))) AS DOUBLE) AS qty_on_hand
  FROM part
  GROUP BY 1, 2, 3
)
SELECT item_number, item_description, store_number, qty_on_hand,
       replace(replace(trim(store_number), ' ', '_'), '-', '_') || '_'
         || replace(replace(trim(item_number), ' ', '_'), '-', '_') AS business_key
FROM agg
""",
)
def pipeline_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YAML-mapped inventory pipeline (reference mapping parity)."""
    return _pipeline(spark, sf_dir, "inventory")


@register(
    "pipeline_clock_in_out",
    oracle="""
WITH agg AS (
  SELECT 'ST' || lpad(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 AS VARCHAR), 2, '0')
           AS store_number,
         CAST(user_id AS VARCHAR) AS system_user_id,
         'Employee ' || CAST(user_id AS VARCHAR) AS employee_name,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS calendar_date,
         CAST(SUM(CAST(value / 60.0 AS DECIMAL(27,6))) AS DOUBLE) AS total_hours_worked,
         CAST(COUNT(*) AS INT) AS punch_count
  FROM events
  GROUP BY 1, 2, 3, 4
)
SELECT store_number, calendar_date, employee_name, system_user_id,
       total_hours_worked, punch_count,
       store_number || '_' || strftime(CAST(calendar_date AS DATE), '%Y%m%d') || '_'
         || replace(replace(employee_name, ' ', '_'), '-', '_') || '_'
         || system_user_id AS business_key
FROM agg
""",
)
def pipeline_clock_in_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity 4-part labor key (round 5):
    {store}_{yyyyMMdd}_{employee}_{user} per reference
    mappings/clock_in_out.yaml:4-5; store/employee derived from the
    events fixture (see pipelines/pipelines.yaml)."""
    return _pipeline(spark, sf_dir, "clock_in_out")


@register(
    "pipeline_sales_channel",
    oracle="""
WITH agg AS (
  SELECT CAST(o_custkey AS VARCHAR) AS store_number,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS calendar_date,
         o_orderstatus AS source_channel,
         o_orderpriority AS source_actor,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS net_sales_usd,
         CAST(COUNT(*) AS INT) AS order_count
  FROM orders
  GROUP BY 1, 2, 3, 4
)
SELECT store_number, calendar_date, source_channel, source_actor, net_sales_usd, order_count,
       store_number || '_' || strftime(CAST(calendar_date AS DATE), '%Y%m%d') || '_'
         || replace(replace(source_actor, ' ', '_'), '-', '_') || '_'
         || replace(replace(source_channel, ' ', '_'), '-', '_') AS business_key
FROM agg
""",
)
def pipeline_sales_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YAML-mapped sales-channel pipeline (reference mapping parity)."""
    return _pipeline(spark, sf_dir, "sales_channel")


# ---------------------------------------------------------------------------
# S2/S6 — XMLA mddataset round-trip: a cube response (Axis0 measures ×
# Axis1 dimension tuples + sparse ordinal cells) flattened to a
# DataFrame via the COO pivot. The response XML is synthesized from the
# nation/region tables, so the oracle is the equivalent SQL aggregate.
# ---------------------------------------------------------------------------
@register(
    "s2_xmla_roundtrip",
    oracle="""
SELECT r.r_name AS region_name,
       CAST(COUNT(*) AS DOUBLE) AS n_nations,
       CAST(SUM(n.n_nationkey) AS DOUBLE) AS sum_nationkey
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
""",
)
def s2_xmla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XMLA celldata parse round-trip: ordinal-invariant axis/cell reconstruction."""
    from bw_new_data_integration_spark.sources import xmla

    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    agg = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"), F.sum("n_nationkey").alias("sum_nationkey"))
        .orderBy("r_name")
        .collect()
    )
    # synthesize the SSAS wire shape: measures on Axis0, one dimension
    # tuple per row on Axis1, cells addressed by the ordinal invariant
    measures = ["n_nations", "sum_nationkey"]
    axis0 = "".join(
        f'<Tuple><Member Hierarchy="[Measures]"><Caption>{m}</Caption></Member></Tuple>'
        for m in measures
    )
    axis1 = "".join(
        f'<Tuple><Member Hierarchy="[Region].[Region Name]"><Caption>{row["r_name"]}</Caption></Member></Tuple>'
        for row in agg
    )
    cells = "".join(
        f'<Cell CellOrdinal="{i * len(measures) + j}"><Value>{row[m]}</Value></Cell>'
        for i, row in enumerate(agg)
        for j, m in enumerate(measures)
    )
    xml_text = (
        '<root xmlns="urn:schemas-microsoft-com:xml-analysis:mddataset">'
        f'<Axes><Axis name="Axis0"><Tuples>{axis0}</Tuples></Axis>'
        f'<Axis name="Axis1"><Tuples>{axis1}</Tuples></Axis></Axes>'
        f"<CellData>{cells}</CellData></root>"
    )
    df = xmla.response_to_df(
        spark, xml_text, [{"pattern": "Region", "field": "region_name"}]
    )
    return df.select("region_name", "n_nations", "sum_nationkey")


# ---------------------------------------------------------------------------
# S1 — partitioned XMLA fetch: one MDX query per fiscal-year slice
# through the injected transport, each response flattened by the COO
# pivot and unioned as DataFrame partitions (sources/xmla.py
# fetch_partitioned; reference modules/olap_sync.py:111-151 splits
# queries per FY exactly like this). The transport is a deterministic
# fake synthesizing SSAS wire responses from the orders table — the
# protocol path (per-slice execute -> parse -> union) is the thing
# under test; the oracle recomputes the same aggregate in SQL.
# ---------------------------------------------------------------------------
@register(
    "s1_xmla_partitioned",
    oracle="""
SELECT CAST(year(o_orderdate) AS VARCHAR) AS fy,
       o_orderpriority AS priority,
       CAST(COUNT(*) AS DOUBLE) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_totalprice
FROM orders GROUP BY 1, 2
""",
)
def s1_xmla_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XMLA cube fetch partitioned per slice (driver-loop fixture twin)."""
    from bw_new_data_integration_spark.sources import xmla

    execute, mdx_by_slice = _xmla_cube_fixture(spark, sf_dir)
    df = xmla.fetch_partitioned(
        spark, execute, mdx_by_slice, [{"pattern": "Priority", "field": "priority"}]
    )
    return df.select(
        F.col("__slice").alias("fy"), "priority", "n_orders", "sum_totalprice"
    )


@register(
    "s1_xmla_partitioned_dist",
    oracle="""
SELECT CAST(year(o_orderdate) AS VARCHAR) AS fy,
       o_orderpriority AS priority,
       CAST(COUNT(*) AS DOUBLE) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_totalprice
FROM orders GROUP BY 1, 2
""",
)
def s1_xmla_partitioned_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 executor-side variant: the per-slice SOAP fetch + XML flatten
    run on executors via xmla.fetch_partitioned_distributed (one slice
    per partition), not in a driver loop. Same cube fixture and oracle
    as s1_xmla_partitioned; the transport factory is pickled to the
    workers, exactly like the S9 paged reader."""
    from bw_new_data_integration_spark.sources import xmla

    execute, mdx_by_slice = _xmla_cube_fixture(spark, sf_dir)
    df = xmla.fetch_partitioned_distributed(
        spark,
        lambda: execute,
        mdx_by_slice,
        [{"pattern": "Priority", "field": "priority"}],
        dim_fields=["priority"],
        measure_fields=["n_orders", "sum_totalprice"],
    )
    return df.select(
        F.col("__slice").alias("fy"), "priority", "n_orders", "sum_totalprice"
    )


# ---------------------------------------------------------------------------
# P-series composite — YAML-driven MDX backfill: the pipeline's MDX
# template (pipelines.yaml source.mdx) rendered per 13-4-calendar
# period via ${slicer} substitution (reference
# modules/pipeline_config.py:20-34 + modules/olap_sync.py:262-280),
# fetched executor-side. "New cube backfill = YAML only, no code."
# ---------------------------------------------------------------------------
@register(
    "mdx_template_backfill",
    oracle="""
WITH y AS (
  SELECT o_orderpriority, o_totalprice, CAST(o_orderdate AS DATE) AS d,
         CASE WHEN CAST(o_orderdate AS DATE) >= make_date(CAST(year(o_orderdate) AS INT), 2, 1)
              THEN CAST(year(o_orderdate) AS INT)
              ELSE CAST(year(o_orderdate) AS INT) - 1 END AS fyi
  FROM orders
), f AS (
  SELECT o_orderpriority, o_totalprice, CAST(fyi AS BIGINT) AS fy,
         CAST(LEAST(date_diff('day', make_date(fyi, 2, 1), d) // 28 + 1, 13) AS BIGINT) AS fp
  FROM y
)
SELECT fy, fp, o_orderpriority AS priority,
       CAST(COUNT(*) AS DOUBLE) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_totalprice
FROM f WHERE fy = 1997
GROUP BY 1, 2, 3
""",
)
def mdx_template_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13-slice cube backfill driven entirely by config: the
    sales_channel MDX template is loaded from pipelines/pipelines.yaml,
    rendered once per fiscal period with ``${slicer}`` bound to the
    reference's 13-4 member string (slicers.mdx_member_13_4), and
    fetched on executors (one slice per partition). The fake transport
    regex-extracts ``[d_Period].&[p]`` from the RENDERED MDX, so an
    unsubstituted template fails loudly — the render step is on the
    verified path. Oracle: the same 13-4 aggregate (Feb-1 anchor, the
    spec's fy_start) in SQL."""
    import re as _re

    from bw_new_data_integration_spark.plans import pipeline as plans
    from bw_new_data_integration_spark.plans import slicers
    from bw_new_data_integration_spark.sources import xmla

    spec = plans.load_pipelines(_PIPELINES_YAML)["sales_channel"]
    fy = 1997
    mdx_by_slice = spec.backfill_mdx(
        {f"{fy}-P{p:02d}": slicers.mdx_member_13_4(fy, p) for p in range(1, 14)}
    )

    # deterministic fake cube: per-(period, priority) truth from orders
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    fy_m, fy_d = spec.fy_start
    agg_rows = (
        o.withColumn("fy", window_ops.fiscal_year_of(d, fy_m, fy_d))
        .withColumn(
            "fp", window_ops.fiscal_period_of(d, window_ops.fiscal_year_start(d, fy_m, fy_d))
        )
        .filter(F.col("fy") == fy)
        .groupBy("fp", "o_orderpriority")
        .agg(
            F.count("*").cast("double").alias("n_orders"),
            aggregate.exact_sum("o_totalprice").alias("sum_totalprice"),
        )
        .collect()
    )
    by_period: dict[int, list] = {}
    for r in agg_rows:
        by_period.setdefault(int(r["fp"]), []).append(r)
    measures = ["n_orders", "sum_totalprice"]

    def make_execute():
        def execute(mdx: str) -> str:
            from bw_new_data_integration_spark.sources.xmla import render_mddataset

            p = int(_re.search(r"\[d_Period\]\.\[d_Period\]\.&\[(\d+)\]", mdx).group(1))
            rows = by_period.get(p, [])
            return render_mddataset(
                measures,
                [[("[Order].[Priority]", r["o_orderpriority"])] for r in rows],
                [[repr(r[m]) for m in measures] for r in rows],
            )

        return execute

    df = xmla.fetch_partitioned_distributed(
        spark,
        make_execute,
        mdx_by_slice,
        [{"pattern": "Priority", "field": "priority"}],
        dim_fields=["priority"],
        measure_fields=measures,
    )
    part = F.split("__slice", "-P")
    return df.select(
        part.getItem(0).cast("bigint").alias("fy"),
        part.getItem(1).cast("bigint").alias("fp"),
        "priority",
        "n_orders",
        "sum_totalprice",
    ).where(F.col("n_orders").isNotNull())


# ---------------------------------------------------------------------------
# S7 — CSV scan with the reference's dirty-input discipline
# (load_csv.py:41-81): header CSV read as all-string (never
# inferSchema), then null tokens, comma-grouped decimals and
# multi-format dates coerced by the expression vocabulary. The CSV is
# staged from orders with deterministic dirt, so the oracle recomputes
# the whole round-trip from the clean table.
# ---------------------------------------------------------------------------
@register(
    "s7_csv_roundtrip",
    oracle="""
WITH dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
              ELSE strftime(CAST(o_orderdate AS DATE), '%-m/%-d/%Y') END AS date_raw,
         CASE WHEN o_orderkey % 7 = 0 THEN '-'
              WHEN o_orderkey % 11 = 0 THEN 'NULL'
              ELSE CAST(o_orderkey % 900 + 100 AS VARCHAR) || ',' ||
                   lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.' ||
                   lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') END AS amount_raw
  FROM orders
),
parsed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN try_strptime(date_raw, '%Y-%m-%d')::DATE
              ELSE try_strptime(date_raw, '%m/%d/%Y')::DATE END AS d,
         CASE WHEN trim(amount_raw) IN ('', '-', 'NULL', 'null', 'N/A', 'n/a') THEN NULL
              ELSE CAST(replace(trim(amount_raw), ',', '') AS DECIMAL(13,2)) END AS amount
  FROM dirty
)
SELECT CAST(year(d) AS BIGINT) AS y, COUNT(*) AS n, COUNT(amount) AS n_amount,
       CAST(SUM(amount) AS DOUBLE) AS sum_amount
FROM parsed GROUP BY 1
""",
)
def s7_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source round-trip with dirty-value discipline."""
    import tempfile

    from bw_new_data_integration_spark.sources import files

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = F.col("o_orderdate").cast("date")
    dirty = o.select(
        k.cast("string").alias("o_orderkey"),
        F.when(k % 4 == 0, F.date_format(d, "yyyy-MM-dd"))
        .otherwise(F.date_format(d, "M/d/yyyy"))
        .alias("date_raw"),
        F.when(k % 7 == 0, "-")
        .when(k % 11 == 0, "NULL")
        .otherwise(
            F.concat(
                (k % 900 + 100).cast("string"),
                F.lit(","),
                F.lpad((k % 1000).cast("string"), 3, "0"),
                F.lit("."),
                F.lpad((k % 100).cast("string"), 2, "0"),
            )
        )
        .alias("amount_raw"),
    )
    path = tempfile.mkdtemp(prefix="bw_csv_src_") + "/orders_csv"
    dirty.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

    raw = files.read_csv_raw(spark, path, columns=["o_orderkey", "date_raw", "amount_raw"])
    parsed = raw.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        coercion.to_date_multiformat(F.col("date_raw")).alias("d"),
        coercion.to_decimal(F.col("amount_raw")).alias("amount"),
    )
    return parsed.groupBy(F.year("d").cast("bigint").alias("y")).agg(
        F.count("*").alias("n"),
        F.count("amount").alias("n_amount"),
        F.sum("amount").cast("double").alias("sum_amount"),
    )


# ---------------------------------------------------------------------------
# S12 — JSON-lines scan: same dirty-input discipline as S7 (all-string
# explicit schema, never inference, coercion deferred to expressions),
# plus PERMISSIVE corrupt-record capture: every 13th line is invalid
# JSON and must land in _corrupt_record, not fail the scan.
# ---------------------------------------------------------------------------
@register(
    "s12_jsonl_roundtrip",
    oracle="""
WITH dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
              ELSE strftime(CAST(o_orderdate AS DATE), '%-m/%-d/%Y') END AS date_raw,
         CASE WHEN o_orderkey % 7 = 0 THEN '-'
              WHEN o_orderkey % 11 = 0 THEN 'NULL'
              ELSE CAST(o_orderkey % 900 + 100 AS VARCHAR) || ',' ||
                   lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.' ||
                   lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') END AS amount_raw
  FROM orders WHERE o_orderkey % 13 <> 0
),
parsed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN try_strptime(date_raw, '%Y-%m-%d')::DATE
              ELSE try_strptime(date_raw, '%m/%d/%Y')::DATE END AS d,
         CASE WHEN trim(amount_raw) IN ('', '-', 'NULL', 'null', 'N/A', 'n/a') THEN NULL
              ELSE CAST(replace(trim(amount_raw), ',', '') AS DECIMAL(13,2)) END AS amount
  FROM dirty
)
SELECT CAST(year(d) AS BIGINT) AS y, COUNT(*) AS n, COUNT(amount) AS n_amount,
       CAST(SUM(amount) AS DOUBLE) AS sum_amount
FROM parsed GROUP BY 1
UNION ALL
SELECT CAST(NULL AS BIGINT), COUNT(*), 0, 0.0
FROM orders WHERE o_orderkey % 13 = 0
""",
)
def s12_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7's dirt vocabulary through a JSONL scan: valid lines are
    to_json structs, every 13th line is deliberately broken JSON. The
    scan (files.read_jsonl_raw) must put broken lines in
    _corrupt_record (counted in the null-year output row) and coerce
    the rest through the same expression vocabulary as CSV."""
    import tempfile

    from bw_new_data_integration_spark.sources import files

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = F.col("o_orderdate").cast("date")
    line = F.when(k % 13 == 0, F.lit('{"broken')).otherwise(
        F.to_json(
            F.struct(
                k.cast("string").alias("o_orderkey"),
                F.when(k % 4 == 0, F.date_format(d, "yyyy-MM-dd"))
                .otherwise(F.date_format(d, "M/d/yyyy"))
                .alias("date_raw"),
                F.when(k % 7 == 0, "-")
                .when(k % 11 == 0, "NULL")
                .otherwise(
                    F.concat(
                        (k % 900 + 100).cast("string"),
                        F.lit(","),
                        F.lpad((k % 1000).cast("string"), 3, "0"),
                        F.lit("."),
                        F.lpad((k % 100).cast("string"), 2, "0"),
                    )
                )
                .alias("amount_raw"),
            )
        )
    )
    path = tempfile.mkdtemp(prefix="bw_jsonl_src_") + "/orders_jsonl"
    o.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(path)

    raw = files.read_jsonl_raw(spark, path, columns=["o_orderkey", "date_raw", "amount_raw"])
    good = raw.filter(F.col("_corrupt_record").isNull())
    parsed = good.select(
        coercion.to_date_multiformat(F.col("date_raw")).alias("d"),
        coercion.to_decimal(F.col("amount_raw")).alias("amount"),
    )
    agg = parsed.groupBy(F.year("d").cast("bigint").alias("y")).agg(
        F.count("*").alias("n"),
        F.count("amount").alias("n_amount"),
        F.sum("amount").cast("double").alias("sum_amount"),
    )
    # the filter references a data column too: Spark disallows queries
    # whose only referenced column is the internal corrupt-record column
    corrupt = (
        raw.filter(F.col("_corrupt_record").isNotNull() & F.col("o_orderkey").isNull())
        .agg(F.count("*").alias("n"))
        .select(
            F.lit(None).cast("bigint").alias("y"),
            "n",
            F.lit(0).cast("bigint").alias("n_amount"),
            F.lit(0.0).alias("sum_amount"),
        )
    )
    return agg.unionByName(corrupt)


# ---------------------------------------------------------------------------
# S13 — gzip-compressed text-shard scan: the standard wire format for
# crawl/document dumps. Spark decompresses .gz line-files natively in
# the scan (one task per file — gzip is unsplittable, which is why
# shard COUNT is the parallelism knob at 100 TB; noted in the gate).
# The shard is staged from documents, so the oracle recomputes from
# the clean table.
# ---------------------------------------------------------------------------
@register(
    "s13_gzip_text",
    oracle="""
SELECT COUNT(*) AS n_lines,
       CAST(SUM(octet_length(encode(text)) + 1 + length(CAST(doc_id AS VARCHAR))) AS BIGINT) AS total_bytes,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
FROM documents
""",
)
def s13_gzip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents as TSV lines in .gz shards (4 files — the shard
    count IS the read parallelism for unsplittable gzip), read them
    back with spark.read.text, and aggregate over the parsed lines."""
    import tempfile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="bw_gz_src_") + "/docs_gz"
    (
        docs.select(F.concat_ws("\t", F.col("doc_id").cast("string"), "text").alias("value"))
        .repartition(4)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(path)
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        F.split("value", "\t", 2).getItem(0).cast("bigint").alias("doc_id"),
        F.length(F.encode(F.col("value"), "UTF-8")).alias("n_bytes"),
    )
    return parsed.agg(
        F.count("*").alias("n_lines"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).cast("bigint").alias("n_even"),
    )


# ---------------------------------------------------------------------------
# S10 — JSONL source round-trip: documents staged to line-delimited
# JSON (the training-corpus interchange format), read back with an
# EXPLICIT schema (never inferSchema — one pass, stable types), then
# aggregated. The oracle recomputes from the clean table, so the gate
# proves serialization + escaping + typed read are lossless.
# ---------------------------------------------------------------------------
@register(
    "s10_jsonl_roundtrip",
    oracle="""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(text)) AS BIGINT) AS total_text_chars
FROM documents GROUP BY 1
""",
)
def s10_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source round-trip with schema enforcement and dirty-value discipline."""
    import tempfile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="bw_jsonl_src_") + "/docs_jsonl"
    docs.coalesce(1).write.mode("overwrite").json(path)
    raw = spark.read.schema("doc_id bigint, text string, lang string, n_chars bigint").json(path)
    return raw.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.length("text")).cast("bigint").alias("total_text_chars"),
    )


# ---------------------------------------------------------------------------
# S9 — OData paged table scan: $select projection, $filter slices,
# $top paging, server-minted @odata.nextLink continuation (reference
# load_store_hours.py:111-138, full_refresh_fy2023_2025.py:78-101),
# feeding the J2 create-vs-update split end-to-end. The protocol runs
# against the deterministic parquet-backed server
# (sources/odata_testing.py): the fixture is synthesized EXECUTOR-side
# (VERDICT r8 #8) — what ships in the fetch closure is the parquet
# path, and each slice walk loads only its own nation's rows via
# predicate pushdown, so the gate runs at ANY scale factor (no driver
# collect, no row cap). The scan itself runs the production reader:
# one $filter slice per nation, each page-walked on an executor via
# mapInPandas.
# ---------------------------------------------------------------------------
@register(
    "s9_odata_scan",
    oracle="""
WITH scanned AS (
  SELECT c_custkey, c_acctbal, c_nationkey, (c_custkey % 3 = 0) AS existing
  FROM customer
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(SUM(CASE WHEN existing THEN 0 ELSE 1 END) AS BIGINT) AS n_create,
       CAST(SUM(CASE WHEN existing THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS sum_acctbal
FROM scanned GROUP BY 1
""",
)
def s9_odata_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OData paged scan: $select projection, nextLink paging, $top limit."""
    from pyspark.sql import types as T

    from bw_new_data_integration_spark.sources import odata
    from bw_new_data_integration_spark.sources.odata_testing import (
        ParquetBackedODataServer,
    )

    c = _t(spark, sf_dir, "customer")
    server = ParquetBackedODataServer(
        _os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal", "c_nationkey"],
    )
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_nationkey", T.IntegerType()),
        ]
    )
    # slice catalog: one $filter per nation — a 25-row distinct, the
    # only thing the driver materializes
    nations = sorted(
        r["c_nationkey"] for r in c.select("c_nationkey").distinct().collect()
    )
    scanned = odata.read_paged_partitioned(
        spark,
        lambda: server.fetch,
        "customers",
        schema,
        slices=[f"c_nationkey eq {n}" for n in nations],
        page_size=97,  # deliberately not divisible into slice sizes: forces multi-page walks
    )
    # The existing keyset comes from the TARGET table (as in the
    # reference's create-vs-update lookup), and the paged scan is
    # materialized (localCheckpoint: blocks are GC-reclaimed, unlike a
    # persist entry) before the split consumes it twice (semi + anti
    # join) — a remote paged source must never be re-fetched per branch.
    scanned = scanned.localCheckpoint(eager=True)
    existing = c.where(F.col("c_custkey") % 3 == 0).select("c_custkey")
    to_create, to_update = merge.split_create_update(scanned, existing, ["c_custkey"])
    uni = to_create.withColumn("is_new", F.lit(1)).unionByName(
        to_update.withColumn("is_new", F.lit(0))
    )
    return uni.groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey")).agg(
        F.sum("is_new").cast("bigint").alias("n_create"),
        F.sum(1 - F.col("is_new")).cast("bigint").alias("n_update"),
        aggregate.exact_sum("c_acctbal").alias("sum_acctbal"),
    )


# ---------------------------------------------------------------------------
# S8 — Excel scan end-to-end (reference load_store_hours.py:64-108):
# a workbook is synthesized from the supplier table (master-data-sized,
# like the reference's store-hours file), read back through the stdlib
# SpreadsheetML reader, headers normalized, values coerced, and P5
# display names + C9 OData quote escaping applied — the full
# file->typed-table path, oracle-checked against the source rows.
# ---------------------------------------------------------------------------
@register(
    "s8_excel_roundtrip",
    oracle="""
WITH base AS (
  SELECT s_suppkey, s_name, s_nationkey, CAST(s_acctbal AS DECIMAL(13,2)) AS bal
  FROM supplier
)
SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
       COUNT(*) AS n_stores,
       CAST(SUM(CAST(bal AS DECIMAL(27,6))) AS DOUBLE) AS sum_acctbal,
       MAX(s_name || ' - ' || CAST(s_suppkey AS VARCHAR)) AS max_display,
       MAX(replace(s_name || '''s', '''', '''''')) AS max_escaped
FROM base GROUP BY 1
""",
)
def s8_excel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel source scan (openpyxl or stdlib-zip fallback) with typed coercion."""
    import tempfile

    from bw_new_data_integration_spark.sources import files

    sup = _t(spark, sf_dir, "supplier")
    rows = _collect_capped(
        sup.select(
            F.col("s_suppkey").cast("string").alias("k"),
            "s_name",
            F.col("s_nationkey").cast("string").alias("n"),
            F.col("s_acctbal").cast("decimal(13,2)").cast("string").alias("b"),
        ).orderBy(F.col("s_suppkey")),
        200_000,
        "s8_excel_roundtrip",
    )
    fd, path = tempfile.mkstemp(suffix=".xlsx", prefix="bw_s8_")
    _os.close(fd)
    files.write_minimal_xlsx(
        path,
        ["Store Number", "Store Name", "Nation Key", "Account Balance"],
        [[r["k"], r["s_name"], r["n"], r["b"]] for r in rows],
    )
    # read_excel materializes rows driver-side, so the workbook can be
    # removed immediately — no temp-file leak per invocation
    df = files.read_excel(spark, path)
    _os.remove(path)
    df = files.normalize_headers(
        df,
        {
            "Store Number": "store_number",
            "Store Name": "store_name",
            "Nation Key": "nationkey",
            "Account Balance": "acctbal",
        },
    )
    typed = df.select(
        "store_number",
        "store_name",
        F.col("nationkey").cast("bigint").alias("nationkey"),
        coercion.to_decimal(F.col("acctbal")).alias("bal"),
        keys.display_name(F.col("store_name"), F.col("store_number")).alias("disp"),
        keys.escape_odata_quotes(F.concat(F.col("store_name"), F.lit("'s"))).alias("esc"),
    )
    return typed.groupBy("nationkey").agg(
        F.count("*").alias("n_stores"),
        aggregate.exact_sum("bal").alias("sum_acctbal"),
        F.max("disp").alias("max_display"),
        F.max("esc").alias("max_escaped"),
    )


# ---------------------------------------------------------------------------
# S11 — ORC round-trip: the engine's second columnar format (built into
# Spark; Hive-ecosystem tables arrive as ORC as often as parquet).
# Orders is staged to ORC with the writer, read back with an explicit
# schema, and aggregated — proving the serialization is lossless for
# every scalar type the engine's data model uses (bigint, double,
# timestamp, string). The oracle recomputes from the parquet source.
# ---------------------------------------------------------------------------
@register(
    "s11_orc_roundtrip",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_total,
       CAST(MIN(o_orderdate) AS VARCHAR) AS min_date,
       CAST(MAX(o_orderdate) AS VARCHAR) AS max_date
FROM orders GROUP BY 1
""",
)
def s11_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round-trip preserving types and values."""
    import tempfile

    o = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="bw_orc_src_") + "/orders_orc"
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        aggregate.exact_sum("o_totalprice").alias("sum_total"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_date"),
    )


# ---------------------------------------------------------------------------
# S14 — XML scan (Spark 4 built-in `xml` source): S7's dirt vocabulary
# through rowTag parsing with an ATTRIBUTE key column (`_k`), plus the
# XML-specific corruption unit — a malformed record poisons the rest of
# ITS FILE (no line framing to resync on), so the fixture ships one
# deliberately truncated file among the good ones and the gate accounts
# ONE corrupt record for it.
# ---------------------------------------------------------------------------
@register(
    "s14_xml_roundtrip",
    oracle="""
WITH sampled AS (
  SELECT * FROM orders WHERE o_orderkey % 10 = 0
),
dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
              ELSE strftime(CAST(o_orderdate AS DATE), '%-m/%-d/%Y') END AS date_raw,
         CASE WHEN o_orderkey % 7 = 0 THEN '-'
              WHEN o_orderkey % 11 = 0 THEN 'NULL'
              ELSE CAST(o_orderkey % 900 + 100 AS VARCHAR) || ',' ||
                   lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.' ||
                   lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') END AS amount_raw
  FROM sampled
),
parsed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN try_strptime(date_raw, '%Y-%m-%d')::DATE
              ELSE try_strptime(date_raw, '%m/%d/%Y')::DATE END AS d,
         CASE WHEN trim(amount_raw) IN ('', '-', 'NULL', 'null', 'N/A', 'n/a') THEN NULL
              ELSE CAST(replace(trim(amount_raw), ',', '') AS DECIMAL(13,2)) END AS amount
  FROM dirty
)
SELECT CAST(year(d) AS BIGINT) AS y, COUNT(*) AS n, COUNT(amount) AS n_amount,
       CAST(SUM(amount) AS DOUBLE) AS sum_amount
FROM parsed GROUP BY 1
UNION ALL
SELECT CAST(NULL AS BIGINT), 1, 0, 0.0
""",
)
def s14_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source round-trip: rowTag + attribute parsing, dirty coercion, per-file corrupt capture."""
    import os
    import tempfile

    from bw_new_data_integration_spark.sources import files

    # deterministic 1-in-10 sample bounds the driver-side fixture
    # write (the XML source needs real FILES on disk) at any bench
    # SF: sf1 stays ~150k rows, well under the _collect_capped limit
    # that aborted the first sf1 bench attempt
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    k = F.col("o_orderkey")
    d = F.col("o_orderdate").cast("date")
    amount_raw = (
        F.when(k % 7 == 0, "-")
        .when(k % 11 == 0, "NULL")
        .otherwise(
            F.concat(
                (k % 900 + 100).cast("string"),
                F.lit(","),
                F.lpad((k % 1000).cast("string"), 3, "0"),
                F.lit("."),
                F.lpad((k % 100).cast("string"), 2, "0"),
            )
        )
    )
    date_raw = F.when(k % 4 == 0, F.date_format(d, "yyyy-MM-dd")).otherwise(
        F.date_format(d, "M/d/yyyy")
    )
    line = F.concat(
        F.lit('<o k="'), k.cast("string"),
        F.lit('"><date_raw>'), date_raw,
        F.lit("</date_raw><amount_raw>"), amount_raw,
        F.lit("</amount_raw></o>"),
    )
    # XML files must be WELL-FORMED documents (the built-in source
    # rejects concatenated root-level rows — the remainder of such a
    # file lands in _corrupt_record), so the fixture is root-wrapped
    # and written driver-side like the s8/s9 fixture seeds (capped)
    rows = _collect_capped(o.select(line.alias("value")), 200_000, "s14_xml_roundtrip")
    path = tempfile.mkdtemp(prefix="bw_xml_src_") + "/orders_xml"
    os.makedirs(path)
    n_files = 4
    for i in range(n_files):
        with open(os.path.join(path, f"part-{i}.xml"), "w") as f:
            f.write("<os>\n")
            f.writelines(r["value"] + "\n" for r in rows[i::n_files])
            f.write("</os>\n")
    # one truncated export among the good files: its broken row
    # (unclosed tag) must land in _corrupt_record, not fail the scan
    with open(os.path.join(path, "part-truncated.xml"), "w") as f:
        f.write('<os><o k="-1"><date_raw>2024-01-01')

    raw = files.read_xml_raw(spark, path, columns=["_k", "date_raw", "amount_raw"])
    good = raw.filter(F.col("_corrupt_record").isNull())
    parsed = good.select(
        coercion.to_date_multiformat(F.col("date_raw")).alias("d"),
        coercion.to_decimal(F.col("amount_raw")).alias("amount"),
    )
    agg = parsed.groupBy(F.year("d").cast("bigint").alias("y")).agg(
        F.count("*").alias("n"),
        F.count("amount").alias("n_amount"),
        F.sum("amount").cast("double").alias("sum_amount"),
    )
    # the filter must reference a data column too (Spark disallows
    # corrupt-column-only queries on raw scans)
    corrupt = (
        raw.filter(F.col("_corrupt_record").isNotNull() & F.col("_k").isNull())
        .agg(F.count("*").alias("n"))
        .select(
            F.lit(None).cast("bigint").alias("y"),
            "n",
            F.lit(0).cast("bigint").alias("n_amount"),
            F.lit(0.0).alias("sum_amount"),
        )
    )
    return agg.unionByName(corrupt)


# ---------------------------------------------------------------------------
# S15 — Delta-table IMPORT (sources/delta_import.py): read a FOREIGN
# Delta table — flat part files, partition values recorded only in the
# transaction log (a real Delta writer never stores partition columns
# in the parquet), a v1 repair commit that remove+adds one partition's
# file. The gate builds the foreign table from orders, replays the log
# through the product import path, and serves the aggregate from the
# imported frame; the oracle reconstructs the same final state from
# the raw rows. Beyond the reference inventory (its sources are
# cube/CSV/OData — modules/get_data.py); at 100 TB this is the "an
# upstream team hands you a Delta table" connector.
# ---------------------------------------------------------------------------
@register(
    "s15_delta_import",
    oracle="""
WITH src AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 7 = 4
),
final AS (  -- v1 repaired the '1-URGENT' partition: price doubled
  SELECT k, CASE WHEN prio = '1-URGENT' THEN price * 2 ELSE price END AS price,
         prio
  FROM src
)
SELECT prio,
       CAST(SUM(CAST(price AS DECIMAL(27,6))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM final GROUP BY prio
""",
)
def s15_delta_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign Delta table import: log replay (flat files, partitionValues in the log, repair commit), served through read_delta."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile

    from bw_new_data_integration_spark.sources.delta_import import read_delta

    tune_for_oracle_parity(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 4)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    root = tempfile.mkdtemp(prefix="bw_dimp_") + "/t"
    log_dir = _os.path.join(root, "_delta_log")
    _os.makedirs(log_dir)
    schema_json = src.schema.json()

    def stage_partition(df, name):
        """Write one partition's rows as ONE flat foreign-layout file
        (partition column dropped — it lives only in the log)."""
        staging = root + f"__stage_{name}"
        df.drop("prio").coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in sorted(_os.listdir(staging))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        _os.replace(_os.path.join(staging, part), _os.path.join(root, name))
        _shutil.rmtree(staging, ignore_errors=True)
        return {
            "path": name,
            "size": _os.path.getsize(_os.path.join(root, name)),
            "modificationTime": 0,
            "dataChange": True,
        }

    prios = [r["prio"] for r in src.select("prio").distinct().collect()]
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "foreign-orders", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json, "partitionColumns": ["prio"],
            "configuration": {}, "createdTime": 0,
        }},
    ]
    for i, pv in enumerate(sorted(prios)):
        add = stage_partition(src.where(F.col("prio") == pv), f"part-{i:05d}.parquet")
        add["partitionValues"] = {"prio": pv}
        actions.append({"add": add})
    with open(_os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(_json.dumps(a) + "\n")
    # v1: upstream repairs the 1-URGENT partition (price doubled)
    urgent_idx = sorted(prios).index("1-URGENT")
    repaired = stage_partition(
        src.where(F.col("prio") == "1-URGENT").withColumn("price", F.col("price") * 2),
        "part-v1-00000.parquet",
    )
    repaired["partitionValues"] = {"prio": "1-URGENT"}
    v1 = [
        {"remove": {"path": f"part-{urgent_idx:05d}.parquet", "dataChange": True}},
        {"add": repaired},
    ]
    with open(_os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        for a in v1:
            fh.write(_json.dumps(a) + "\n")
    imported = read_delta(spark, root)
    return imported.groupBy("prio").agg(
        F.sum(F.col("price").cast("decimal(27,6)")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# S16 — incremental lake ingest (sources/delta_import.sync_from_delta):
# the INGEST twin of k16's change-driven REST sync. A foreign
# append-only Delta table is consumed with a watermark stored as the
# keyed table's SetTransaction marker (advances atomically with each
# commit): first sync bootstraps, the second applies only the two
# appended versions (newest commit wins for a re-appended key), the
# third is a no-op. The oracle reconstructs the final keyed state; the
# action sequence rides in-row.
# ---------------------------------------------------------------------------
@register(
    "s16_delta_incremental_sync",
    oracle="""
WITH src AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 7 = 0
),
base AS (SELECT * FROM src WHERE k % 2 = 0),            -- v0
app1 AS (SELECT * FROM src WHERE k % 4 = 1),            -- v1 append
app2 AS (SELECT k, price * 3 AS price, prio FROM src    -- v2 re-append (LWW)
         WHERE k % 6 = 0),
final AS (
  SELECT * FROM base WHERE k % 6 <> 0
  UNION ALL SELECT * FROM app1
  UNION ALL SELECT * FROM app2
)
SELECT prio,
       CAST(SUM(CAST(price AS DECIMAL(27,6))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows,
       'bootstrap' AS first_action,
       'incremental' AS second_action,
       'noop' AS third_action
FROM final GROUP BY prio
""",
)
def s16_delta_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked incremental ingest of a foreign append-only Delta table into a keyed table (bootstrap -> incremental -> noop)."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile

    from bw_new_data_integration_spark.sources.delta_import import sync_from_delta
    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

    tune_for_oracle_parity(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    root = tempfile.mkdtemp(prefix="bw_dsync_") + "/t"
    log_dir = _os.path.join(root, "_delta_log")
    _os.makedirs(log_dir)

    def stage(df, name):
        staging = root + f"__stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in sorted(_os.listdir(staging))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        _os.replace(_os.path.join(staging, part), _os.path.join(root, name))
        _shutil.rmtree(staging, ignore_errors=True)
        return {
            "path": name, "partitionValues": {},
            "size": _os.path.getsize(_os.path.join(root, name)),
            "modificationTime": 0, "dataChange": True,
        }

    k = F.col("k")
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "upstream-orders", "format": {"provider": "parquet", "options": {}},
            "schemaString": src.schema.json(), "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": stage(src.where(k % 2 == 0), "part-00000.parquet")},
    ]
    with open(_os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in v0:
            fh.write(_json.dumps(a) + "\n")
    t = ParquetKeyedTable(root + "_sink", ["k"])
    first = sync_from_delta(spark, root, t)["action"]
    # upstream appends: new keys (v1) and a repriced re-append (v2)
    for v, df, name in (
        (1, src.where(k % 4 == 1), "part-v1.parquet"),
        (2, src.where(k % 6 == 0).withColumn("price", F.col("price") * 3),
         "part-v2.parquet"),
    ):
        add = stage(df, name)
        with open(_os.path.join(log_dir, f"{v:020d}.json"), "w") as fh:
            fh.write(_json.dumps({"add": add}) + "\n")
    second = sync_from_delta(spark, root, t)["action"]
    third = sync_from_delta(spark, root, t)["action"]
    return (
        t.read(spark)
        .groupBy("prio")
        .agg(
            F.sum(F.col("price").cast("decimal(27,6)")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "prio", "sum_price", "n_rows",
            F.lit(first).alias("first_action"),
            F.lit(second).alias("second_action"),
            F.lit(third).alias("third_action"),
        )
    )

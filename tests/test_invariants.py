"""The reference's operational invariants as assertions (SURVEY.md §5):
business-key uniqueness, date-only semantics under hostile session
timezones, run-to-run determinism under different parallelism, and
partition pruning on partitioned targets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bw_new_data_integration_spark import queries as q
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

from .conftest import SF_SMALL

PIPELINES = [
    "pipeline_daily_sales",
    "pipeline_sales_channel",
    "pipeline_offers",
    "pipeline_inventory",
    "pipeline_clock_in_out",
]


@pytest.mark.parametrize("name", PIPELINES)
def test_business_key_unique(name, spark):
    """Every pipeline output must be unique on its alternate key — the
    upsert sink's correctness precondition (modules/dataverse.py:88)."""
    df = q.registry()[name](spark, SF_SMALL)
    total = df.count()
    distinct = df.select("business_key").distinct().count()
    assert total == distinct, f"{name}: {total - distinct} duplicate business keys"


def test_date_only_semantics_survive_hostile_timezone(spark):
    """Calendar dates must not shift when the session timezone is not
    UTC (the reference strips time for exactly this reason,
    modules/pipeline_runner.py:89-100). Queries self-tune to UTC."""
    fn = q.registry()["pipeline_daily_sales"]
    baseline = {r["business_key"] for r in fn(spark, SF_SMALL).select("business_key").collect()}
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        hostile = {r["business_key"] for r in fn(spark, SF_SMALL).select("business_key").collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert baseline == hostile


def test_determinism_across_parallelism(spark):
    """k1_dedupe_latest (the canary: duplicate keys + window ordering)
    must return identical rows under different shuffle widths —
    the decimal-accumulation/total-ordering policy at work."""
    fn = q.registry()["k1_dedupe_latest"]
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        narrow = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    wide = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    assert narrow == wide


def test_partitioned_target_prunes(spark, tmp_path):
    """A date-partitioned target's read plan must show partition
    filters, not a full scan — the 100 TB trailing-window MERGE
    depends on this."""
    t = ParquetKeyedTable(str(tmp_path / "pt"), ["k"], partition_by=["month"])
    df = spark.createDataFrame(
        [Row(k=f"k{i}", month=f"2024-{1 + i % 3:02d}", v=float(i)) for i in range(30)]
    )
    t.overwrite(df)
    read = t.read(spark).filter(F.col("month") == "2024-01")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan, plan[:800]
    assert read.count() == 10


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_plan_quality_pushdown_and_broadcast(spark):
    """Regression guard on physical-plan shape: slicer filters reach
    the parquet scan (pushed, not post-scan), column pruning holds, and
    dimension joins broadcast instead of shuffling the fact side."""
    a1 = q.registry()["a1_pricing_summary"](spark, SF_SMALL)
    plan = _plan(a1)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan, plan[:600]
    # projection needs 7 of lineitem's 16 columns; the scan must not read more
    import re

    scan_cols = re.search(r"FileScan parquet \[([^\]]*)\]", plan).group(1)
    assert len(scan_cols.split(",")) <= 7, scan_cols

    j2 = q.registry()["j2_broadcast_lookup"](spark, SF_SMALL)
    plan = _plan(j2)
    assert "BroadcastHashJoin" in plan, plan[:600]
    assert "SortMergeJoin" not in plan


def test_rollup_roundtrips_through_f2(spark):
    """O10 ∘ F2 = identity on the leaf grain: generating the cube
    surface (GROUP BY ROLLUP with 'All' markers) and then applying the
    reference's rollup-row discard recovers exactly the plain
    two-dimension aggregate."""
    from bw_new_data_integration_spark.operators import aggregate

    rolled = q.registry()["o10_rollup_grains"](spark, SF_SMALL)
    leaf = aggregate.drop_rollup_rows(rolled, ["nation", "order_year"])
    o = q._t(spark, SF_SMALL, "orders")
    c = q._t(spark, SF_SMALL, "customer")
    plain = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").cast("string").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("string").alias("order_year"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    got = {(r["nation"], r["order_year"]): r["n_orders"] for r in leaf.collect()}
    want = {(r["nation"], r["order_year"]): r["n_orders"] for r in plain.collect()}
    assert got == want
    # and the rollup really contains the two super-grains
    alls = rolled.filter(F.col("order_year") == "All")
    assert alls.filter(F.col("nation") == "All").count() == 1  # grand total
    assert alls.count() == 1 + plain.select("nation").distinct().count()


def test_zorder_box_query_locality(spark, tmp_path):
    """The point of z-ordering: a box predicate on BOTH keys touches a
    small fraction of z-ordered files, where a linear sort prunes on
    its leading column only. Measured as the number of distinct files
    holding matching rows (exactly what row-group min/max pruning
    skips by) at the same file count for both layouts."""
    from bw_new_data_integration_spark.operators import zorder

    n = 1 << 16
    df = spark.range(0, n).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") / 128).cast("long") % 128).alias("y"),  # independent grid coords
        F.col("id").alias("payload"),
    )
    n_files = 64
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    zorder.write_zordered(df, zpath, "x", "y", n_files=n_files, bits=7)
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where((F.col("x") >= 32) & (F.col("x") < 48) & (F.col("y") >= 32) & (F.col("y") < 48))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, l_files = files_touched(zpath), files_touched(lpath)
    # linear: the x-stripe is 1/8 of x-space -> ~8 of 64 files, every
    # one containing the y-range; z-order: the box is an aligned
    # Morton tile, 1/64 of the key space -> ~1-2 files
    assert z_files * 2 <= l_files, (z_files, l_files)
    assert z_files <= n_files // 16, (z_files, l_files)
    # sanity: both layouts return identical rows
    a = spark.read.parquet(zpath).where("x >= 32 and x < 48 and y >= 32 and y < 48")
    b = spark.read.parquet(lpath).where("x >= 32 and x < 48 and y >= 32 and y < 48")
    assert sorted(r["payload"] for r in a.collect()) == sorted(r["payload"] for r in b.collect())


def test_orc_scan_pushdown_and_pruning(spark, tmp_path):
    """S14's scale contract: the ORC source must behave like parquet at
    the scan — predicate pushed into the reader, projection pruned to
    the referenced columns. A format that reads whole stripes for a
    2-column filter query is not a viable 100 TB lake format."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("grp"),
        (F.col("id") * 2.0).alias("a"),
        (F.col("id") * 3.0).alias("b"),
        (F.col("id") * 5.0).alias("c"),
    )
    path = str(tmp_path / "orc_push")
    df.write.orc(path)
    read = (
        spark.read.schema(df.schema).orc(path).where(F.col("grp") < 5).select("k", "grp")
    )
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "FileScan orc" in plan, plan[:600]
    assert "PushedFilters: [IsNotNull(grp), LessThan(grp,5)" in plan, plan[:800]
    import re

    scan_cols = re.search(r"FileScan orc \[([^\]]*)\]", plan).group(1)
    assert sorted(col.split("#")[0] for col in scan_cols.split(",")) == ["grp", "k"], scan_cols
    assert read.count() == 500


def test_hash_sampling_family(spark):
    """operators/sampling.py: hash_sample / hash_split are pure
    per-row functions of (salt, key) — stable under repartitioning,
    disjoint-and-exhaustive for splits, and independent across salts."""
    from bw_new_data_integration_spark.operators.sampling import (
        hash_bucket,
        hash_sample,
        hash_split,
    )

    df = spark.range(0, 20_000).select(F.col("id").alias("k"))
    s25 = hash_sample(df, F.col("k"), 0.25, salt="a")
    n = s25.count()
    assert 0.22 * 20_000 < n < 0.28 * 20_000  # binomial, generous bound
    # layout-independence: same rows after an arbitrary repartition
    ids = {r["k"] for r in s25.collect()}
    ids2 = {r["k"] for r in hash_sample(df.repartition(13), F.col("k"), 0.25, salt="a").collect()}
    assert ids == ids2
    # salt independence: two draws overlap ~ fraction^2, not ~ fraction
    ids_b = {r["k"] for r in hash_sample(df, F.col("k"), 0.25, salt="b").collect()}
    overlap = len(ids & ids_b) / 20_000
    assert 0.03 < overlap < 0.10  # expect ~0.0625

    tagged = hash_split(df, F.col("k"), eval_fraction=0.10, salt="sp")
    counts = {r["split"]: r["n"] for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "eval"}
    assert counts["train"] + counts["eval"] == 20_000  # exhaustive, disjoint
    assert 0.07 * 20_000 < counts["eval"] < 0.13 * 20_000
    # split agrees with the bucket expression it is defined from
    row = df.select(hash_bucket(F.col("k"), "sp").alias("b")).first()
    assert 0 <= row["b"] < 100
    with pytest.raises(ValueError):
        hash_sample(df, F.col("k"), 1.5)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides of a recurring big-big join on the join key
    lets the join run with NO exchange on either side — the 100 TB
    answer to repeated fact-to-fact joins (SURVEY.md §4)."""
    from bw_new_data_integration_spark import catalog

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        left = spark.range(0, 10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        right = spark.range(0, 10_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        catalog.write_bucketed(left, "bkt_left", ["k"], n_buckets=8, sort_cols=["k"])
        catalog.write_bucketed(right, "bkt_right", ["k"], n_buckets=8, sort_cols=["k"])
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:500]
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_q17_plan_broadcasts_brand_filter(spark):
    """Q17's scale plan hinges on the brand part-list broadcasting into
    lineitem BEFORE the per-part threshold aggregate — a sort-merge
    join here would shuffle the full fact table twice."""
    q17 = q.registry()["q17_small_quantity_revenue"](spark, SF_SMALL)
    plan = _plan(q17)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:1200]
    assert "SortMergeJoin" not in plan, plan[:1200]


def test_q18_having_collapses_to_runtime_broadcast(spark):
    """After the HAVING filter, the big-order key set is tiny; AQE must
    convert the joins back to orders/customer into broadcasts at
    runtime rather than shuffling both fact sides."""
    df = q.registry()["q18_large_orders"](spark, SF_SMALL)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]
    # the only fact-side exchange is the l_orderkey aggregation
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:2000]


def test_approx_distinct_error_bound(spark):
    """The HLL++ sketch (rsd=0.02) must stay within 5% of the exact
    distinct count — the accuracy contract that makes it a legitimate
    100 TB substitute for countDistinct."""
    rows = q.registry()["a8_approx_distinct_sketch"](spark, SF_SMALL).collect()
    assert rows, "sketch query returned no rows"
    for r in rows:
        assert r["approx_ok"], (r["order_year"], r["n_exact"])


def test_scd2_idempotent_and_single_current(spark):
    """SCD2 invariants: (a) re-applying the same updates is a no-op —
    change detection sees the new current rows already carry the
    attributes; (b) every key has exactly one current row; (c) closed
    rows keep their original attributes."""
    from bw_new_data_integration_spark.operators import merge

    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01", None, True), (2, "B", "2020-01-01", None, True)],
        "k bigint, seg string, valid_from string, valid_to string, is_current boolean",
    )
    ups = spark.createDataFrame([Row(k=1, seg="Z", eff="2021-06-01"), Row(k=3, seg="C", eff="2021-06-01")])
    once = merge.scd2_merge(dim, ups, ["k"], ["seg"], "eff").localCheckpoint(eager=True)
    twice = merge.scd2_merge(once, ups, ["k"], ["seg"], "eff")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    cur = once.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur) and len(cur) == 3
    closed = {(r["k"], r["seg"], r["valid_to"]) for r in once.filter(~F.col("is_current")).collect()}
    assert closed == {(1, "A", "2021-06-01")}


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    """compact() must rewrite the snapshot into fewer files without
    changing the data, and the pre-compaction version must remain
    addressable (time travel is how a bad compaction is rolled back)."""
    import glob

    t = ParquetKeyedTable(str(tmp_path / "ct"), ["k"])
    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "k bigint, v double")
    t.overwrite(df.repartition(16))
    v_before = t.current_version()
    files_before = len(glob.glob(f"{t._snapshot_dir(v_before)}/*.parquet"))
    assert files_before > 1
    t.compact(spark)
    v_after = t.current_version()
    files_after = len(glob.glob(f"{t._snapshot_dir(v_after)}/*.parquet"))
    assert files_after == 1 < files_before
    assert sorted(map(tuple, t.read(spark).collect())) == sorted(map(tuple, df.collect()))
    assert t.read(spark, version=v_before).count() == 1000


def test_kmeans_partitions_all_vectors(spark):
    """k-means invariants: every vector is assigned to exactly one of k
    clusters, and a second run produces the identical assignment (the
    no-random-state contract)."""
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.operators import kmeans

    emb = catalog.load(spark, SF_SMALL, "embeddings")
    total = emb.count()
    a1 = kmeans.kmeans_assign(spark, emb, k=5, max_iter=2)
    assert a1.count() == total
    assert a1.select("vec_id").distinct().count() == total
    assert a1.select("cluster").distinct().count() <= 5
    a2 = kmeans.kmeans_assign(spark, emb, k=5, max_iter=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_profile_approx_within_tolerance(spark):
    """profile(approx=True)'s HLL++ estimates are engine-specific, so the
    accuracy contract is pinned two ways: the raw operator's estimated
    distinct counts within 5% of the exact profile's with identical
    deterministic fields (nulls, min, max), and the registry gate query's
    approx_ok booleans all TRUE (what the driver's oracle hash checks)."""
    from bw_new_data_integration_spark.operators import profiling

    base = q.registry()["profile_table"](spark, SF_SMALL)  # loads via catalog
    exact = {r.col_name: r for r in base.collect()}
    cols = {r.col_name for r in exact.values()}
    raw = profiling.profile(
        spark.read.parquet(f"{SF_SMALL}/orders.parquet"), sorted(cols), approx=True, rsd=0.02
    )
    approx = {r.col_name: r for r in raw.collect()}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert a.n_nulls == e.n_nulls, c
        assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.05 * e.n_distinct), (
            c, e.n_distinct, a.n_distinct,
        )
    gate = q.registry()["profile_table_approx"](spark, SF_SMALL).collect()
    assert all(r.approx_ok for r in gate), gate


def test_profile_exact_plan_has_no_expand(spark):
    """The exact profile must use per-column pruned branches, never the
    Expand row-multiplication Catalyst plans for multi-countDistinct —
    at 100 TB an Expand multiplies the scan output by the number of
    profiled columns."""
    df = q.registry()["profile_table"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan[:2000]


def test_contamination_broadcasts_eval_pool(spark):
    """The decontamination join must broadcast the (benchmark-sized)
    eval shingle set — a shuffle of the full training corpus's shingles
    against a tiny pool is the wrong plan at any scale."""
    df = q.registry()["contamination_check"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_split_leakage_free_groups_never_span_splits(spark):
    """Exact duplicates (same content fingerprint) must land in one
    split — the property that makes the split leakage-free."""
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.functions import text as tx
    from pyspark.sql import functions as F

    docs = catalog.load(spark, SF_SMALL, "documents")
    f = tx.fingerprint(F.col("text"))
    bucket = F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("bigint") % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    spanning = (
        docs.select(f.alias("f"), split.alias("split"))
        .groupBy("f")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert spanning == 0


def test_redact_pii_replaces_identifiers(spark):
    from bw_new_data_integration_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("reach me at jo.doe+x@mail.example.org or 555-123-4567 today",),
         ("no pii here",)],
        "t string",
    ).select(
        tx.redact_pii(F.col("t")).alias("r"),
        tx.pii_email_count(F.col("t")).alias("e"),
        tx.pii_phone_count(F.col("t")).alias("p"),
    )
    rows = df.collect()
    assert rows[0]["r"] == "reach me at [EMAIL] or [PHONE] today"
    assert (rows[0]["e"], rows[0]["p"]) == (1, 1)
    assert rows[1]["r"] == "no pii here"


def test_balance_mixture_equalizes_groups(spark):
    """After balancing, every language's share is within sampling noise
    of the smallest group (hash-threshold sampling is rate-exact only
    in expectation), and re-running selects the identical rows."""
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.operators import sampling

    docs = catalog.load(spark, SF_SMALL, "documents")
    smallest = min(
        r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    b1 = sampling.balance_mixture(docs, "lang", "doc_id")
    counts = {r["lang"]: r["n"] for r in b1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n <= smallest * 1.5 + 10, (lang, n, smallest)
        assert n >= smallest * 0.5 - 10, (lang, n, smallest)
    b2 = sampling.balance_mixture(docs, "lang", "doc_id")
    assert sorted(r["doc_id"] for r in b1.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in b2.select("doc_id").collect()
    )


def test_chunk_documents_windows(spark):
    """Chunk windows: stride arithmetic, overlap content, boundary and
    empty-doc behavior — every token covered, consecutive chunks share
    exactly `overlap` tokens (except a short final window)."""
    from pyspark.sql import Row

    from bw_new_data_integration_spark.operators import sampling

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"t{i}" for i in range(10))),  # 1 chunk, exact
            Row(doc_id=2, text=" ".join(f"t{i}" for i in range(11))),  # 2 chunks
            Row(doc_id=3, text=" ".join(f"t{i}" for i in range(25))),  # windows
            Row(doc_id=4, text="solo"),
            Row(doc_id=5, text="   "),  # whitespace-only -> one empty chunk
            Row(doc_id=6, text=None),  # NULL -> one empty chunk, never -1 tokens
        ]
    )
    out = sampling.chunk_documents(docs, "text", max_tokens=10, overlap=3).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["chunk_tokens"] for r in by_doc[1]] == [10]
    # 11 tokens, stride 7: chunk0 = t0..t9, chunk1 = t7..t10 (4 tokens)
    assert [r["chunk_tokens"] for r in by_doc[2]] == [10, 4]
    assert by_doc[2][1]["chunk_text"].split() == ["t7", "t8", "t9", "t10"]
    # 25 tokens, stride 7 -> ceil((25-3)/7)=4 chunks; overlap check
    c3 = by_doc[3]
    assert len(c3) == 4
    for a, b in zip(c3, c3[1:]):
        at, bt = a["chunk_text"].split(), b["chunk_text"].split()
        shared = min(3, len(bt))
        assert at[-shared:] == bt[:shared] if len(at) == 10 else True
    # full coverage: dedup-ing overlaps reconstructs the doc
    seen = []
    for r in c3:
        toks = r["chunk_text"].split()
        seen.extend(toks[3:] if seen else toks)
    assert seen == [f"t{i}" for i in range(25)]
    assert [r["chunk_tokens"] for r in by_doc[4]] == [1]
    assert [(r["chunk_tokens"], r["chunk_text"]) for r in by_doc[5]] == [(0, "")]
    assert [(r["chunk_tokens"], r["chunk_text"]) for r in by_doc[6]] == [(0, "")]
    with pytest.raises(ValueError, match="overlap"):
        sampling.chunk_documents(docs, "text", max_tokens=8, overlap=8)


@pytest.mark.parametrize(
    "max_tokens,overlap", [(10, 3), (8, 0), (5, 4), (16, 15), (7, 1)]
)
def test_chunk_documents_property_sweep(spark, max_tokens, overlap):
    """Property, swept across window configs: for every doc length 0..N,
    de-overlapped chunk concatenation reconstructs the document exactly
    (no token lost, none duplicated), every chunk except the last is
    full-width, and chunk starts advance by exactly the stride."""
    from pyspark.sql import Row

    from bw_new_data_integration_spark.operators import sampling

    stride = max_tokens - overlap
    docs = spark.createDataFrame(
        [Row(doc_id=n, text=" ".join(f"w{i}" for i in range(n))) for n in range(0, 40)]
    )
    out = sampling.chunk_documents(docs, "text", max_tokens=max_tokens, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n in range(0, 40):
        chunks = sorted(by_doc[n], key=lambda r: r["chunk_id"])
        expect_chunks = max(1, -(-(max(n, 0) - overlap) // stride)) if n > 0 else 1
        assert len(chunks) == expect_chunks, (n, [c["chunk_text"] for c in chunks])
        rebuilt: list[str] = []
        for i, c in enumerate(chunks):
            toks = c["chunk_text"].split()
            assert toks == [f"w{j}" for j in range(i * stride, min(i * stride + max_tokens, n))]
            rebuilt.extend(toks[overlap:] if i else toks)
        assert rebuilt == [f"w{i}" for i in range(n)]


def test_pack_sequences_respects_budget(spark):
    """Every doc lands in exactly one bin; a bin's total exceeds the
    budget only by (part of) its last straddling document — total minus
    that doc is always under budget."""
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.operators import sampling

    docs = catalog.load(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    budget = 2048
    packed = sampling.pack_sequences(docs, "doc_id", "n_chars", budget=budget, n_shards=8)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    bins = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_chars").alias("total"), F.max("n_chars").alias("biggest"))
        .collect()
    )
    for r in bins:
        assert r["total"] - r["biggest"] < budget, dict(r.asDict())


def test_q19_disjunctive_predicates_push_into_both_scans(spark):
    """Catalyst must extract per-table conjuncts from the OR-of-ANDs
    join predicate and push them into BOTH parquet scans (CNF
    conversion) — at 100 TB an unpushed disjunction reads the whole
    fact table."""
    df = q.registry()["q19_disjunctive_revenue"](spark, SF_SMALL)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    part_scan = next(ln for ln in scans if "part.parquet" in ln)
    li_scan = next(ln for ln in scans if "lineit" in ln)
    assert "p_brand" in part_scan and "p_size" in part_scan, part_scan[:300]
    assert "l_quantity" in li_scan, li_scan[:300]


def test_hash_threshold_sample_is_composable(spark):
    """Claimed property: sampling at rate a then rate b keeps exactly
    the rate-min(a,b) set (the kept set is a hash prefix), which is
    what makes repeated downsampling reproducible."""
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.operators import sampling

    docs = catalog.load(spark, SF_SMALL, "documents")
    twice = sampling.hash_threshold_sample(
        sampling.hash_threshold_sample(docs, "doc_id", 0.5), "doc_id", 0.2
    )
    once = sampling.hash_threshold_sample(docs, "doc_id", 0.2)
    assert sorted(r["doc_id"] for r in twice.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in once.select("doc_id").collect()
    )


def test_point_in_time_lookup_picks_exactly_one_version(spark):
    """Each fact matches exactly the dimension version whose validity
    interval contains its timestamp — closed history rows for old
    facts, the open current row for new ones, never both."""
    from bw_new_data_integration_spark.operators import merge as mg

    dim = spark.createDataFrame(
        [
            (1, "OLD", "2020-01-01", "2022-01-01"),
            (1, "NEW", "2022-01-01", None),
            (2, "ONLY", "2020-01-01", None),
        ],
        "k bigint, seg string, valid_from string, valid_to string",
    )
    facts = spark.createDataFrame(
        [(1, "2021-06-01"), (1, "2022-06-01"), (2, "2020-02-01")],
        "fk bigint, ts string",
    ).withColumnRenamed("fk", "k")
    out = mg.point_in_time_lookup(facts, dim, ["k"], "ts")
    got = sorted((r["ts"], r["seg"]) for r in out.collect())
    assert got == [("2020-02-01", "ONLY"), ("2021-06-01", "OLD"), ("2022-06-01", "NEW")]


def test_parse_image_dims_real_headers():
    """The stdlib image-header walker recovers true dimensions from
    real bytes: a fully valid PNG (zlib IDAT + CRCs), a JPEG marker
    stream whose SOF0 sits behind APP0/DQT segments that must be
    skipped, GIF logical-screen descriptors — and returns nulls (never
    raises) for corrupt or truncated payloads."""
    from bw_new_data_integration_spark.operators import multimodal as mm

    png = mm.make_png(7, 3, seed=42)
    assert mm.parse_image_dims(png) == ("png", 7, 3)
    # the fixture PNG must be genuinely valid: CRCs check out and the
    # IDAT inflates to height * (1 + width) filtered-scanline bytes
    import struct
    import zlib

    off, idat = 8, None
    while off < len(png):
        (length,) = struct.unpack(">I", png[off : off + 4])
        typ = png[off + 4 : off + 8]
        body = png[off + 4 : off + 8 + length]
        (crc,) = struct.unpack(">I", png[off + 8 + length : off + 12 + length])
        assert zlib.crc32(body) & 0xFFFFFFFF == crc
        if typ == b"IDAT":
            idat = png[off + 8 : off + 8 + length]
        off += 12 + length
    assert len(zlib.decompress(idat)) == 3 * (1 + 7)

    jpg = mm.make_jpeg_header(640, 480)
    assert mm.parse_image_dims(jpg) == ("jpeg", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 6
    assert mm.parse_image_dims(gif) == ("gif", 12, 34)
    assert mm.parse_image_dims(b"not an image at all") == (None, None, None)
    assert mm.parse_image_dims(None) == (None, None, None)
    assert mm.parse_image_dims(png[:15]) == ("png", None, None)  # truncated
    truncated_jpeg = b"\xff\xd8\xff\xe0\x00\x08\x00\x00\x00\x00\x00\x00"  # no SOF
    assert mm.parse_image_dims(truncated_jpeg) == ("jpeg", None, None)
    # zero dims are corrupt in EVERY format arm, not just PNG: a GIF
    # zero logical-screen descriptor and a zero-dim JPEG SOF both null
    # out rather than leaking (fmt, 0, 0) into downstream columns
    zero_gif = b"GIF89a" + struct.pack("<HH", 0, 34) + b"\x00" * 6
    assert mm.parse_image_dims(zero_gif) == ("gif", None, None)
    zero_jpg = bytearray(mm.make_jpeg_header(640, 480))
    sof = bytes(zero_jpg).find(b"\xff\xc0")
    zero_jpg[sof + 5 : sof + 9] = struct.pack(">HH", 0, 640)  # height=0
    assert mm.parse_image_dims(bytes(zero_jpg)) == ("jpeg", None, None)


def test_parse_y4m_header_rejects_nonpositive_fps():
    """F-25:1 / F25:-1 / F0:1 headers are corrupt, not 'negative
    timestamps later': parse_y4m_header nulls the whole stream so
    iter/sample_y4m_frames follow the corrupt-blob zero-rows contract."""
    from bw_new_data_integration_spark.operators import multimodal as mm

    good = mm.make_y4m(4, 4, 2)
    assert mm.parse_y4m_header(good) is not None
    for bad_f in (b"F-25:1", b"F25:-1", b"F0:1", b"F25:0"):
        bad = good.replace(b"F25:1", bad_f)
        assert bad != good  # the fixture really contains F25:1
        assert mm.parse_y4m_header(bad) is None
        assert list(mm.iter_y4m_frames(bad)) == []


def test_compressed_codec_stub_seams(spark):
    """The operator-level stub seams for codecs we don't ship a real
    decoder for (extract_image_features / sample_video_frames) keep the
    REAL Spark contract — Arrow-batched mapInPandas, schema, explode
    shape, determinism — with only the decode kernel stubbed. These
    replaced the never-sampled *_stub registry twins in round 5."""
    from bw_new_data_integration_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(1, b"x" * 40), (2, b"y" * 300)], "media_id long, payload binary"
    )
    feats = mm.extract_image_features(media).collect()
    assert {r["media_id"] for r in feats} == {1, 2}
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same payload -> same vector
    again = mm.extract_image_features(media).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, again))

    frames = mm.sample_video_frames(media, every_ms=500).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 1  # 40 bytes // 64 -> floor 0 -> min 1 frame
    assert len(by_id[2]) == 4  # 300 // 64 = 4 frames
    assert [r["frame_ts_ms"] for r in sorted(by_id[2], key=lambda r: r["frame_idx"])] == [
        0,
        500,
        1000,
        1500,
    ]


def test_extract_image_meta_mixed_batch(spark):
    """extract_image_meta parses real dimensions batch-wise and maps
    corrupt payloads to null rows instead of failing the task."""
    from bw_new_data_integration_spark.operators import multimodal as mm

    rows = [
        (1, mm.make_png(5, 9)),
        (2, mm.make_jpeg_header(100, 50)),
        (3, b"garbage bytes here"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: (r["format"], r["width"], r["height"])
           for r in mm.extract_image_meta(df).collect()}
    assert got == {1: ("png", 5, 9), 2: ("jpeg", 100, 50), 3: (None, None, None)}


def test_fiscal_anchor_non_jan1(spark):
    """13-4 calendar with a configurable FY anchor (reference
    modules/olap_sync.py:264-274): with a Feb-1 start, Jan-15 belongs
    to the PRIOR fiscal year's final period, Feb-1 opens period 1, and
    day 364 caps at period 13."""
    from bw_new_data_integration_spark.operators import window_ops as w

    df = spark.createDataFrame(
        [("2021-01-15",), ("2021-02-01",), ("2021-03-01",), ("2022-01-31",)],
        "d string",
    ).select(F.col("d").cast("date").alias("d"))
    out = df.select(
        "d",
        w.fiscal_year_of(F.col("d"), 2, 1).alias("fy"),
        w.fiscal_period_of(F.col("d"), w.fiscal_year_start(F.col("d"), 2, 1)).alias("fp"),
    )
    got = {str(r["d"]): (r["fy"], r["fp"]) for r in out.collect()}
    assert got["2021-01-15"] == (2020, 13)  # day 349 of FY2020
    assert got["2021-02-01"] == (2021, 1)
    assert got["2021-03-01"] == (2021, 2)  # day 28 -> period 2
    assert got["2022-01-31"] == (2021, 13)  # last day of FY2021


def test_runner_fy_start_flag_and_spec(spark):
    """--fy-start MM-DD overrides the pipeline spec's fy_start; both
    flow into the F5 slicer predicate."""
    import argparse

    from bw_new_data_integration_spark import runner
    from bw_new_data_integration_spark.plans import pipeline as plans

    assert plans.parse_fy_start("02-01") == (2, 1)
    assert plans.parse_fy_start(None) == (1, 1)
    assert plans.parse_fy_start([7, 4]) == (7, 4)
    with pytest.raises(ValueError):
        plans.parse_fy_start("13-01")

    spec = plans.PipelineSpec(
        name="t", source_table="lineitem",
        mapping=plans.MappingSpec(table="t", alternate_key="k",
                                  business_key_format=None, fields=(), measures=()),
        slicer_column="l_shipdate", fy_start=(2, 1),
    )
    df = spark.createDataFrame(
        [("2021-01-15",), ("2021-02-10",)], "l_shipdate string"
    )
    args = argparse.Namespace(fy=2020, fp=13, length=None, fy_start=None)
    sl = runner.build_slicer(spec, args)  # spec anchor: Feb-1
    assert [r["l_shipdate"] for r in df.filter(sl).collect()] == ["2021-01-15"]
    args2 = argparse.Namespace(fy=2021, fp=1, length=None, fy_start="03-01")
    sl2 = runner.build_slicer(spec, args2)  # flag overrides: Mar-1 anchor
    assert [r["l_shipdate"] for r in df.filter(sl2).collect()] == []


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """Skew guard (operators/dedup.py minhash_lsh_candidates
    max_bucket_size): on a 50%-identical corpus the boilerplate bucket
    must emit n-1 hub-star edges instead of n(n-1)/2 all-pairs, and
    connected-component reachability must be preserved — the capped
    keep-list equals the uncapped one."""
    from bw_new_data_integration_spark.operators import dedup

    n_boiler, n_unique = 100, 100
    boiler = spark.range(n_boiler).selectExpr(
        "id AS doc_id",
        "'legal boilerplate all rights reserved see terms of service for details' AS text",
    )
    unique = spark.range(n_unique).selectExpr(
        "id + 1000 AS doc_id",
        "concat('unique document number ', id, ' discussing topic ', id * 7, "
        "' with entirely distinct content ', id * 13) AS text",
    )
    corpus = boiler.unionByName(unique)

    capped = dedup.minhash_lsh_candidates(corpus, max_bucket_size=10).localCheckpoint()
    boiler_pairs = capped.filter((F.col("a_id") < 1000) & (F.col("b_id") < 1000))
    # star topology: every boilerplate doc pairs with the hub (min id 0) only
    assert boiler_pairs.count() == n_boiler - 1
    assert boiler_pairs.filter(F.col("a_id") != 0).count() == 0
    # output is linear in bucket size, not quadratic
    assert capped.count() < n_boiler * (n_boiler - 1) // 2

    uncapped = dedup.minhash_lsh_candidates(corpus).localCheckpoint()
    assert uncapped.filter(
        (F.col("a_id") < 1000) & (F.col("b_id") < 1000)
    ).count() == n_boiler * (n_boiler - 1) // 2

    ids = corpus.select("doc_id")
    keep_capped = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_duplicates(ids, capped).collect()
    }
    keep_uncapped = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_duplicates(ids, uncapped).collect()
    }
    assert keep_capped == keep_uncapped


def test_make_wav_valid_and_parse_wav_real_decode():
    """make_wav fixtures must be genuinely valid WAV files — verified
    with the stdlib `wave` reader, independent of our parser — and
    parse_wav must recover the true rate/samples, returning all-Nones
    (never raising) for corrupt, truncated, or compressed payloads."""
    import io
    import struct
    import wave

    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    w = mm.make_wav(1234, sample_rate=8000, seed=5)
    with wave.open(io.BytesIO(w)) as rd:
        assert rd.getframerate() == 8000
        assert rd.getnchannels() == 1
        assert rd.getsampwidth() == 2
        assert rd.getnframes() == 1234
        frames = rd.readframes(1234)
    expect = ((5 * 31 + np.arange(1234, dtype=np.int64) * 17) % 65536 - 32768).astype("<i2")
    assert frames == expect.tobytes()

    rate, channels, bits, data = mm.parse_wav(w)
    assert (rate, channels, bits) == (8000, 1, 16)
    assert data == frames

    assert mm.parse_wav(b"not audio") == (None, None, None, None)
    assert mm.parse_wav(None) == (None, None, None, None)
    assert mm.parse_wav(w[:10]) == (None, None, None, None)
    # compressed (non-PCM) fmt tag -> null path, not a misdecode
    mp3ish = bytearray(w)
    mp3ish[20:22] = struct.pack("<H", 85)  # MPEG layer 3 format tag
    assert mm.parse_wav(bytes(mp3ish)) == (None, None, None, None)


def test_make_mp4_valid_and_parse_mp4_real_decode():
    """parse_mp4 walks real box chains (v0 and v1 mvhd, 64-bit
    largesize) and returns all-Nones for corrupt or mvhd-less input."""
    import struct

    from bw_new_data_integration_spark.operators import multimodal as mm

    v = mm.make_mp4(7500, timescale=600, n_tracks=2, width=640, height=360)
    # floor round-trip: 7500ms * 600 // 1000 = 4500 units -> 7500ms
    assert mm.parse_mp4(v) == (7500, 600, 2)
    # box sizes must be internally consistent: walking top-level boxes
    # exactly consumes the payload
    pos, seen = 0, []
    while pos < len(v):
        (size,) = struct.unpack(">I", v[pos : pos + 4])
        seen.append(v[pos + 4 : pos + 8])
        pos += size
    assert pos == len(v) and seen == [b"ftyp", b"moov"]

    # version-1 mvhd (64-bit times) parses too
    mvhd1 = struct.pack(">B3x", 1) + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 3)
    moov = struct.pack(">I", 8 + 8 + len(mvhd1)) + b"moov" + struct.pack(
        ">I", 8 + len(mvhd1)
    ) + b"mvhd" + mvhd1
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
    assert mm.parse_mp4(ftyp + moov) == (3000, 90000, 0)

    assert mm.parse_mp4(b"not a video") == (None, None, None)
    assert mm.parse_mp4(None) == (None, None, None)
    assert mm.parse_mp4(v[:20]) == (None, None, None)  # truncated moov


def test_render_mdx_template_dollar_brace_only():
    """${var}-only substitution (reference modules/pipeline_config.py:
    20-34): literal MDX {...} sets pass through untouched, unknown
    variables stay as-is, and PipelineSpec.backfill_mdx renders one MDX
    string per slice from pipelines.yaml."""
    import os

    from bw_new_data_integration_spark.plans import pipeline as plans
    from bw_new_data_integration_spark.plans import slicers

    mdx = "SELECT { [Measures].[X] } ON COLUMNS FROM [C] WHERE ( ${slicer} )"
    out = plans.render_mdx_template(mdx, {"slicer": "[13-4].[d_Year].&[2024]"})
    assert out == "SELECT { [Measures].[X] } ON COLUMNS FROM [C] WHERE ( [13-4].[d_Year].&[2024] )"
    assert plans.render_mdx_template(mdx, None) == mdx
    assert "${missing}" in plans.render_mdx_template("a ${missing} b", {"other": 1})

    yaml_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pipelines", "pipelines.yaml",
    )
    spec = plans.load_pipelines(yaml_path)["sales_channel"]
    assert spec.catalog == "Sales"
    assert spec.fy_start == (2, 1)
    rendered = spec.backfill_mdx(
        {f"P{p}": slicers.mdx_member_13_4(2024, p) for p in (1, 13)}
    )
    assert set(rendered) == {"P1", "P13"}
    assert "[d_Period].[d_Period].&[13]" in rendered["P13"]
    assert "${slicer}" not in rendered["P1"]
    assert "{ [Measures].[Net Sales], [Measures].[Order Count] }" in rendered["P1"]
    with pytest.raises(ValueError):
        slicers.mdx_member_13_4(2024, 14)
    daily = plans.load_pipelines(yaml_path)["daily_sales"]
    assert daily.mdx is None
    with pytest.raises(ValueError):
        daily.render_mdx({"slicer": "x"})


def test_aqe_splits_skewed_join_partition(spark):
    """The 100 TB answer to a skewed big-big join is AQE's
    OptimizeSkewedJoin: with skew thresholds lowered, the hot key's
    partition must be split (skew=true in the final adaptive plan)
    rather than serializing in one task — and values must match the
    non-AQE plan exactly."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    # 95% of fact rows hit one key; dim is uniform
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, 7).otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # global agg downstream: a groupBy on the join key would REQUIRE
        # hash partitioning and make AQE skip the skew split (splitting
        # duplicates the build side, breaking that partitioning).
        # sum(v) keeps the varying payload column in the shuffle — a
        # constant-key-only partition lz4-compresses under the skew
        # threshold and never looks skewed
        joined = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.sum("w").alias("sw"), F.sum("v").alias("sv")
        )
        got = joined.collect()[0]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    base = fact.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw"), F.sum("v").alias("sv")
    ).collect()[0]
    assert (got["n"], got["sw"], got["sv"]) == (base["n"], base["sw"], base["sv"])


def test_media_parsers_never_raise_on_fuzzed_bytes():
    """The corrupt-blob contract, fuzzed: parse_image_dims / parse_wav /
    parse_mp4 must return tuples (never raise) on arbitrary bytes —
    including adversarial inputs built from real signatures with
    corrupted interiors, truncations, and huge declared sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bw_new_data_integration_spark.operators import multimodal as mm

    real = [
        mm.make_png(5, 4, seed=1),
        mm.make_jpeg_header(100, 50),
        mm.make_wav(64, sample_rate=8000, seed=2),
        mm.make_mp4(1500, timescale=600),
        mm.make_gif(6, 5, seed=3),
        mm.make_jpeg(6, 5, seed=4),
        mm.make_y4m(4, 4, 2, seed=5),
        mm.make_jpeg_color(5, 4, seed=6),
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=256), st.integers(0, 7), st.integers(0, 200))
    def fuzz(junk, pick, cut):
        base = real[pick]
        candidates = [
            junk,
            base[:cut],                      # truncation
            base[:8] + junk,                 # real signature, junk body
            junk + base,                     # junk prefix
            base[: len(base) // 2] + junk + base[len(base) // 2 :],  # corrupted interior
        ]
        for payload in candidates:
            assert len(mm.parse_image_dims(payload)) == 3
            assert len(mm.parse_wav(payload)) == 4
            assert len(mm.parse_mp4(payload)) == 3
            r = mm.decode_png_gray(payload)
            assert r is None or r.ndim == 2
            r = mm.decode_gif_gray(payload)
            assert r is None or r.ndim == 2
            r = mm.decode_jpeg_gray(payload)
            assert r is None or r.ndim == 2
            hdr = mm.parse_y4m_header(payload)
            assert hdr is None or len(hdr) == 6
            for f in mm.iter_y4m_frames(payload):
                assert len(f) == 3
            r = mm.decode_jpeg_ycbcr(payload)
            assert r is None or r.ndim == 3

    fuzz()


def test_color_jpeg_roundtrip_and_rejections():
    """Baseline color JPEG: YCbCr 4:4:4 MCU-interleaved round-trip
    within 2 levels per channel; gray/color decoders reject each
    other's payloads; malformed color structure (bad scan component
    id, subsampled SOF, scan-count mismatch) returns None; JFIF
    BT.601 conversion hits its spec points."""
    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    for (w, h, seed) in [(5, 4, 1), (29, 13, 42), (1, 1, 3), (16, 16, 0)]:
        b = mm.make_jpeg_color(w, h, seed=seed)
        px = mm.decode_jpeg_ycbcr(b)
        assert px is not None and px.shape == (h, w, 3)
        for ch in range(3):
            expect = np.fromfunction(
                lambda y, x: (x * 31 + y * 17 + seed + 85 * ch) % 256, (h, w), dtype=np.int64
            )
            assert int(np.abs(px[:, :, ch].astype(np.int64) - expect).max()) <= 2

    color, gray = mm.make_jpeg_color(6, 5), mm.make_jpeg(6, 5)
    assert mm.decode_jpeg_gray(color) is None
    assert mm.decode_jpeg_ycbcr(gray) is None
    assert mm.decode_jpeg_gray(gray) is not None

    # targeted structural corruption: each must be None, never raise
    def patch(payload: bytes, find: bytes, repl: bytes) -> bytes:
        i = payload.index(find)
        return payload[:i] + repl + payload[i + len(find) :]

    # SOS references component id 9 (not in SOF)
    assert mm.decode_jpeg_ycbcr(patch(color, b"\x03\x01\x00\x02\x11", b"\x03\x09\x00\x02\x11")) is None
    # SOF declares 4:2:0 sampling for Y (0x22)
    assert mm.decode_jpeg_ycbcr(patch(color, b"\x01\x11\x00\x02\x11\x01", b"\x01\x22\x00\x02\x11\x01")) is None
    # scan component count disagrees with SOF
    assert mm.decode_jpeg_ycbcr(patch(color, b"\x03\x01\x00\x02\x11", b"\x02\x01\x00\x02\x11")) is None

    # JFIF BT.601 spec points: neutral chroma is gray; full Cr lifts R
    neutral = np.array([[[100, 128, 128]]], dtype=np.uint8)
    assert (mm.ycbcr_to_rgb(neutral)[0, 0] == [100, 100, 100]).all()
    red = np.array([[[76, 85, 255]]], dtype=np.uint8)  # ~pure red in YCbCr
    r, g, b2 = (int(v) for v in mm.ycbcr_to_rgb(red)[0, 0])
    assert r >= 250 and g <= 5 and b2 <= 5


def test_y4m_real_frame_decode_and_sampling():
    """Y4M decode is REAL: exact two-level luma planes come back
    byte-for-byte for every chroma mode; sampling is by presentation
    time (frame period from the F tag), truncation salvages the valid
    prefix, and a decompression-bomb header is rejected."""
    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    # exact pixels, all chroma modes (chroma size changes frame stride)
    for chroma in ("420jpeg", "422", "444", "mono"):
        b = mm.make_y4m(8, 6, 3, seed=9, chroma=chroma)
        frames = list(mm.iter_y4m_frames(b))
        assert [f[0] for f in frames] == [0, 1, 2]
        for i, ts, y in frames:
            c = (9 * 31 + i * 7) % 255
            expect = bytes([c]) * 24 + bytes([c + 1]) * 24
            assert y == expect and ts == i * 40

    # presentation-time sampling at 30000:1001 fps (NTSC): frame period
    # floor-divides to 33ms, so every_ms=100 keeps ts 0,100,200 ->
    # frames 0,4(133ms>=100? no: ts_i = i*1000*1001//30000 = i*33)
    b = mm.make_y4m(4, 4, 10, fps=(30000, 1001), seed=1)
    ts = [f[1] for f in mm.iter_y4m_frames(b)]
    assert ts == [i * 1000 * 1001 // 30000 for i in range(10)]

    # truncation mid-frame salvages the complete prefix frames
    b = mm.make_y4m(8, 8, 4, seed=2)
    assert [f[0] for f in mm.iter_y4m_frames(b[:-5])] == [0, 1, 2]

    # bomb guard: header declaring > MAX_DECODE_PIXELS is corrupt
    bomb = b"YUV4MPEG2 W100000 H100000 F25:1 Ip A1:1 C420jpeg\n"
    assert mm.parse_y4m_header(bomb) is None
    # missing mandatory tokens / zero dims are corrupt, not crashes
    assert mm.parse_y4m_header(b"YUV4MPEG2 W0 H4 F25:1\n") is None
    assert mm.parse_y4m_header(b"YUV4MPEG2 H4 F25:1\n") is None
    assert mm.parse_y4m_header(b"YUV4MPEG2 W4 H4 F0:1\n") is None
    # luma_sum invariant the oracle relies on: c*n + n//2
    b = mm.make_y4m(16, 16, 1, seed=77)
    _, _, y = next(iter(mm.iter_y4m_frames(b)))
    c = (77 * 31) % 255
    assert int(np.frombuffer(y, np.uint8).sum(dtype=np.int64)) == c * 256 + 128


def test_png_pixel_decode_inverts_all_filters():
    """decode_png_gray must invert every PNG scanline filter
    (None/Sub/Up/Average/Paeth) to the identical true pixels, and
    return None (never raise) for non-PNG, truncated, unsupported
    color types, and corrupt-deflate payloads."""
    import struct
    import zlib

    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    expect = np.array(
        [[(x * 31 + y * 17 + 9) % 256 for x in range(23)] for y in range(11)], dtype=np.uint8
    )
    for ft in range(5):
        px = mm.decode_png_gray(mm.make_png(23, 11, seed=9, filter_type=ft))
        assert px is not None and (px == expect).all(), f"filter {ft}"

    assert mm.decode_png_gray(b"junk") is None
    assert mm.decode_png_gray(None) is None
    assert mm.decode_png_gray(mm.make_jpeg_header(4, 4)) is None
    png = mm.make_png(6, 3, seed=1)
    assert mm.decode_png_gray(png[:30]) is None  # truncated
    # RGB color type (2) is out of scope for the gray decoder -> None
    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    rgb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + chunk(b"IEND", b""))
    assert mm.decode_png_gray(rgb) is None
    # corrupt deflate stream inside a well-formed chunk -> None
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", b"\xde\xad\xbe\xef") + chunk(b"IEND", b""))
    assert mm.decode_png_gray(bad) is None


def test_gif_lzw_roundtrip_and_corrupt_contract():
    """make_gif produces spec-shaped GIF87a streams (multi-sub-block,
    variable LZW code width, table reset past 4096 codes) that
    decode_gif_gray inverts to the exact pixel formula; corrupt,
    truncated, and interlaced inputs return None, never raise."""
    import struct

    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    for (w, h, s) in [(1, 1, 0), (23, 11, 9), (200, 150, 77)]:
        gif = mm.make_gif(w, h, seed=s)
        px = mm.decode_gif_gray(gif)
        expect = np.array(
            [[(x * 31 + y * 17 + s) % 256 for x in range(w)] for y in range(h)], dtype=np.uint8
        )
        assert px is not None and (px == expect).all(), (w, h, s)
        assert mm.parse_image_dims(gif) == ("gif", w, h)

    gif = mm.make_gif(10, 10, seed=1)
    assert mm.decode_gif_gray(b"junk") is None
    assert mm.decode_gif_gray(None) is None
    assert mm.decode_gif_gray(gif[:25]) is None
    # interlace flag set -> out of scope -> None. The image descriptor
    # sits after header(6) + LSD(7) + 256-entry palette(768) — don't
    # search for b"," (0x2C is also palette gray 44).
    img_desc = 6 + 7 + 768
    assert gif[img_desc] == 0x2C
    flagged = bytearray(gif)
    flagged[img_desc + 9] |= 0x40
    assert mm.decode_gif_gray(bytes(flagged)) is None
    # truncated LZW stream (EOI never arrives) -> None
    assert mm.decode_gif_gray(gif[:-10]) is None


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Spark's runtime bloom-filter join pruning — the selective dim
    filter's key set becomes a bloom filter applied on the fact side
    BEFORE the join shuffle. At 100 TB the default size thresholds
    engage it automatically; here they're lowered to fire on fixture
    sizes. Values must match the un-filtered plan exactly."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    li = q.registry()  # noqa: F841 - force registry import parity with other tests
    from bw_new_data_integration_spark import queries as qq

    lineitem = qq._t(spark, SF_SMALL, "lineitem")
    orders = qq._t(spark, SF_SMALL, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
        assert "BloomFilterMightContain" in plan or "might_contain" in plan, plan[:1500]
        got = {r["o_orderstatus"]: r["n"] for r in j.collect()}
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert got == {r["o_orderstatus"]: r["n"] for r in base.collect()}


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning: joining a month-partitioned fact to a
    filtered dimension must inject a DynamicPruning subquery into the
    fact scan's partition filters — only the dimension's surviving
    months are read. The other 100 TB scan lever next to static
    pruning and bloom filters."""
    fact_dir = str(tmp_path / "fact")
    spark.range(0, 3000).select(
        (F.col("id") % 12 + 1).cast("int").alias("month"),
        F.col("id").alias("v"),
    ).write.partitionBy("month").parquet(fact_dir)
    dim = spark.createDataFrame(
        [(m, "keep" if m <= 2 else "drop") for m in range(1, 13)], "month int, tag string"
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        fact = spark.read.parquet(fact_dir)
        j = fact.join(dim.filter(F.col("tag") == "keep"), "month")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:1500]
        assert j.count() == 500  # months 1-2 only: 250 rows each
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_jpeg_baseline_codec_roundtrip_and_contract():
    """The baseline JPEG codec: encode (FDCT, unit quantization,
    generated canonical Huffman, 0xFF stuffing) then decode must land
    within 1 level of the true pixels at every size class (sub-block,
    aligned, padded edges); corrupt/truncated/header-only payloads
    return None, never raise."""
    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    for (w, h, s) in [(1, 1, 5), (8, 8, 0), (23, 11, 9), (64, 40, 3)]:
        jpg = mm.make_jpeg(w, h, seed=s)
        px = mm.decode_jpeg_gray(jpg)
        expect = np.array(
            [[(x * 31 + y * 17 + s) % 256 for x in range(w)] for y in range(h)], dtype=np.int64
        )
        assert px is not None and px.shape == (h, w)
        assert np.abs(px.astype(np.int64) - expect).max() <= 1, (w, h, s)
        assert mm.parse_image_dims(jpg) == ("jpeg", w, h)

    assert mm.decode_jpeg_gray(b"junk") is None
    assert mm.decode_jpeg_gray(None) is None
    assert mm.decode_jpeg_gray(mm.make_jpeg_header(10, 10)) is None  # no scan data
    assert mm.decode_jpeg_gray(mm.make_jpeg(16, 16, 1)[:40]) is None  # truncated
    # progressive frame marker (SOF2) -> unsupported -> None
    jpg = bytearray(mm.make_jpeg(8, 8, 2))
    jpg[jpg.index(b"\xff\xc0", 2) + 1] = 0xC2
    assert mm.decode_jpeg_gray(bytes(jpg)) is None


def test_media_decoders_survive_targeted_corruption():
    """Regression pins for the review findings: corruptions that sit
    BEHIND well-formed headers (where blind fuzzing can't reach) must
    yield None/null, not a task-killing exception — truncated JPEG DQT,
    WAV rate=0, GIF LZW min-code >8, PNG dims past Int32/pixel caps,
    zlib bombs, and GIFs whose image dims differ from the screen."""
    import struct
    import zlib

    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    # 1. JPEG with truncated DQT (fewer than 64 entries)
    jpg = mm.make_jpeg(8, 8, seed=1)
    dqt_at = jpg.index(b"\xff\xdb")
    short = jpg[:dqt_at] + struct.pack(">BBH", 0xFF, 0xDB, 2 + 11) + jpg[dqt_at + 4 : dqt_at + 4 + 11] + jpg[dqt_at + 4 + 65 :]
    assert mm.decode_jpeg_gray(short) is None

    # 2. PCM WAV declaring sample_rate=0: parse -> Nones, features -> null row
    wav = bytearray(mm.make_wav(32, sample_rate=8000, seed=1))
    wav[24:28] = struct.pack("<I", 0)
    assert mm.parse_wav(bytes(wav)) == (None, None, None, None)

    # 3. GIF with LZW minimum code size > 8
    gif = bytearray(mm.make_gif(4, 3, seed=1))
    min_code_at = 6 + 7 + 768 + 10
    assert gif[min_code_at] == 8
    gif[min_code_at] = 12
    assert mm.decode_gif_gray(bytes(gif)) is None

    # 4. PNG IHDR declaring dims past the Int32 / pixel caps
    def png_chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    huge = (b"\x89PNG\r\n\x1a\n"
            + png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4_000_000_000, 5, 8, 0, 0, 0, 0))
            + png_chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + png_chunk(b"IEND", b""))
    assert mm.parse_image_dims(huge) == ("png", None, None)
    assert mm.decode_png_gray(huge) is None

    # 5. zlib bomb behind a small-dims IHDR: bounded inflate, no blow-up
    bomb = (b"\x89PNG\r\n\x1a\n"
            + png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + png_chunk(b"IDAT", zlib.compress(b"\x00" * 50_000_000, 9))
            + png_chunk(b"IEND", b""))
    px = mm.decode_png_gray(bomb)  # inflates only 4*(4+1) bytes
    assert px is None or px.shape == (4, 4)

    # 6. GIF whose image-descriptor dims differ from the logical screen:
    # the pixel stream follows the DESCRIPTOR layout
    gif2 = bytearray(mm.make_gif(20, 5, seed=3))
    gif2[6:8] = struct.pack("<H", 10)  # lie about the screen: 10x10
    gif2[8:10] = struct.pack("<H", 10)
    px = mm.decode_gif_gray(bytes(gif2))
    expect = np.array([[(x * 31 + y * 17 + 3) % 256 for x in range(20)] for y in range(5)], dtype=np.uint8)
    assert px is not None and px.shape == (5, 20) and (px == expect).all()


def test_mulaw_expansion_spec_points_and_gate_arm():
    """G.711 µ-law expansion endpoints (ITU-T G.711): code 0xFF is
    silence (0), code 0x00 is the negative extreme (-32124), 0x80 the
    positive extreme (+32124); magnitudes are symmetric in the sign
    bit. make_wav_ulaw payloads decode through extract's real path."""
    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    codes = np.arange(256, dtype=np.uint8)
    lin = mm.mulaw_expand(codes)
    assert lin[0xFF] == 0
    assert lin[0x00] == -32124
    assert lin[0x80] == 32124
    # sign symmetry: code c and c^0x80 have equal magnitude
    assert (np.abs(lin[: 128]) == np.abs(lin[128:])).all()
    # monotonic decreasing magnitude within the negative half
    mags = np.abs(lin[:128])
    assert (np.diff(mags) <= 0).all()

    w = mm.make_wav_ulaw(64, sample_rate=8000, seed=3)
    rate, channels, bits, data, fmt = mm.parse_wav_fmt(w)
    assert (rate, channels, bits, fmt) == (8000, 1, 8, mm.WAV_FMT_MULAW)
    assert len(data) == 64


def test_multi_year_backfill_equals_full_fy_run(spark, tmp_path):
    """--backfill-years runs one bounded slice per 13-4 period (the
    reference's period-at-a-time backfill discipline); 13 idempotent
    period upserts must converge to exactly the single full-FY run."""
    import argparse

    from bw_new_data_integration_spark import runner
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.plans import pipeline as plans
    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

    specs = plans.load_pipelines(runner.DEFAULT_PIPELINES)
    name = "sales_channel"

    def mkargs(root):
        return argparse.Namespace(
            fy=None, fp=None, length=None, fy_start=None,
            sf_dir=SF_SMALL, target_root=str(root),
            dry_run=False, print_plan=False,
        )

    # period-at-a-time: 13 slices of FY1997
    a = mkargs(tmp_path / "by_period")
    for fp in range(1, 14):
        a.fy, a.fp = 1997, fp
        runner.run_one(spark, specs, name, a)
    # one full-FY run
    b = mkargs(tmp_path / "full_fy")
    b.fy = 1997
    runner.run_one(spark, specs, name, b)

    key = specs[name].mapping.alternate_key
    ta = ParquetKeyedTable(str(tmp_path / "by_period" / specs[name].mapping.table), [key])
    tb = ParquetKeyedTable(str(tmp_path / "full_fy" / specs[name].mapping.table), [key])
    # compare by column name (physical column ORDER may differ between
    # the upsert-created tables) and ignore the per-run audit timestamp
    cols = sorted(set(ta.read(spark).columns) - {"last_refreshed"})
    ra = sorted(map(tuple, ta.read(spark).select(*cols).collect()))
    rb = sorted(map(tuple, tb.read(spark).select(*cols).collect()))
    assert ra == rb and len(ra) > 0


def test_resize_nearest_and_thumbnail_contract(spark):
    """resize_nearest: exact NN index map for down- and up-sampling;
    extract_thumbnails: real decode -> resize -> stats with null rows
    for undecodable payloads and thumbnail bytes matching the stats."""
    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    px = np.arange(12 * 20, dtype=np.uint8).reshape(12, 20) % 256
    t = mm.resize_nearest(px, 8, 8)
    assert t.shape == (8, 8)
    for y in range(8):
        for x in range(8):
            assert t[y, x] == px[(y * 12) // 8, (x * 20) // 8]
    up = mm.resize_nearest(px[:2, :3], 8, 8)  # upsample repeats
    assert up.shape == (8, 8) and up[0, 0] == px[0, 0]

    media = spark.createDataFrame(
        [
            (1, mm.make_png(20, 12, seed=7)),
            (2, mm.make_gif(5, 3, seed=9)),
            (3, b"definitely not an image"),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in mm.extract_thumbnails(media).collect()}
    assert rows[3]["thumb"] is None and rows[3]["pix_sum"] is None
    for did, w, h, seed in [(1, 20, 12, 7), (2, 5, 3, 9)]:
        r = rows[did]
        flat = list(r["thumb"])
        assert len(flat) == 64
        assert sum(flat) == r["pix_sum"]
        assert flat[0] == r["first_px"] and flat[-1] == r["last_px"]
        expect = [
            ((((x * w) // 8) * 31 + ((y * h) // 8) * 17 + seed) % 256)
            for y in range(8)
            for x in range(8)
        ]
        assert flat == expect, did


def test_jpeg_entropy_corruption_fuzz():
    """Targeted fuzz of the LUT entropy decoder (round-5 rewrite):
    flip/truncate/extend bytes INSIDE the entropy-coded segment of
    valid gray and color JPEGs — the decoder must never raise and must
    return either None or a correctly-shaped uint8 array. This drives
    the fast-path/slow-path boundaries (invalid codes, amplitude past
    end-of-stream, ZRL overruns) harder than whole-payload fuzzing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bw_new_data_integration_spark.operators import multimodal as mm

    fixtures = [
        (mm.make_jpeg(13, 9, seed=3), (9, 13), mm.decode_jpeg_gray),
        (mm.make_jpeg_color(11, 7, seed=5), (7, 11, 3), mm.decode_jpeg_ycbcr),
    ]
    # entropy data sits between the SOS segment and the EOI marker
    spans = []
    for payload, shape, decode in fixtures:
        sos = payload.index(b"\xff\xda")
        start = sos + 2 + int.from_bytes(payload[sos + 2 : sos + 4], "big")
        spans.append((payload, start, len(payload) - 2, shape, decode))

    @settings(max_examples=400, deadline=None)
    @given(
        st.integers(0, 1),
        st.integers(0, 10**6),
        st.integers(1, 255),
        st.sampled_from(["flip", "truncate", "extend", "zero"]),
    )
    def fuzz(pick, pos_seed, delta, mode):
        payload, start, end, shape, decode = spans[pick]
        pos = start + pos_seed % max(1, end - start)
        b = bytearray(payload)
        if mode == "flip":
            b[pos] = (b[pos] + delta) % 256
        elif mode == "zero":
            b[pos] = 0
        elif mode == "truncate":
            b = b[:pos] + payload[-2:]  # keep EOI
        else:  # extend: inject junk mid-stream
            b = b[:pos] + bytes([delta]) * 3 + b[pos:]
        out = decode(bytes(b))
        assert out is None or (
            out.shape == shape and out.dtype.name == "uint8"
        ), (pick, pos, mode)

    fuzz()


class _RecordingNativeDecoder:
    """Fixture 'native codec' for the frozen decoder seam
    (multimodal.default_gray_decoder's contract): asserts the input
    contract executor-side (bytes in, 2-D uint8 or None out) and
    produces pixels through an independent call path. Pickled into the
    Arrow workers like a real libjpeg-turbo wrapper would be."""

    def __call__(self, payload):
        import numpy as np

        from bw_new_data_integration_spark.operators import multimodal as mm

        assert isinstance(payload, bytes), type(payload)  # frozen: bytes in
        out = mm.default_gray_decoder(payload)
        assert out is None or (out.dtype == np.uint8 and out.ndim == 2)
        return out


class _ConstantPlaneDecoder:
    """Decodes EVERYTHING (even garbage) to a constant 4x4 plane —
    injected to prove the seam is live, not decorative."""

    def __call__(self, payload):
        import numpy as np

        return np.full((4, 4), 7, dtype=np.uint8)


def _seam_media(spark, mm):
    return spark.createDataFrame(
        [
            (1, mm.make_png(20, 12, seed=7)),
            (2, mm.make_gif(5, 3, seed=9)),
            (3, mm.make_jpeg(16, 8, seed=3)),
            (4, b"definitely not an image"),
            (5, None),
        ],
        "doc_id long, payload binary",
    )


def test_native_decoder_seam_dropin_identical(spark):
    """A drop-in decoder honoring the frozen seam signature reproduces
    the default pipeline's output EXACTLY on both seam consumers
    (thumbnails + pixel stats) — the codec-swap contract the module
    docstring promises (VERDICT r5 #9)."""
    from bw_new_data_integration_spark.operators import multimodal as mm

    media = _seam_media(spark, mm)
    base = sorted(map(tuple, mm.extract_thumbnails(media).collect()))
    injected = sorted(
        map(tuple, mm.extract_thumbnails(media, decoder=_RecordingNativeDecoder()).collect())
    )
    assert injected == base and len(base) == 5

    stats_media = media.withColumnRenamed("doc_id", "media_id")
    sbase = sorted(map(tuple, mm.extract_image_pixel_stats(stats_media).collect()))
    sinj = sorted(
        map(
            tuple,
            mm.extract_image_pixel_stats(
                stats_media, decoder=_RecordingNativeDecoder()
            ).collect(),
        )
    )
    assert sinj == sbase and len(sbase) == 5


def test_native_decoder_seam_is_live(spark):
    """An injected decoder actually takes effect: the constant-plane
    double decodes every non-null payload (including bytes the built-in
    dispatch rejects) to 4x4 sevens, so thumbnails become 64 sevens and
    only the null payload stays a null row."""
    from bw_new_data_integration_spark.operators import multimodal as mm

    media = _seam_media(spark, mm)
    rows = {
        r["doc_id"]: r
        for r in mm.extract_thumbnails(media, decoder=_ConstantPlaneDecoder()).collect()
    }
    for did in (1, 2, 3, 4):
        assert list(rows[did]["thumb"]) == [7] * 64
        assert rows[did]["pix_sum"] == 7 * 64
    assert rows[5]["thumb"] is None and rows[5]["pix_sum"] is None


def test_bloom_prefilter_no_false_negatives_and_fp_bound(spark):
    """operators/bloom.py contract: every true member probes maybe=True
    (no false negatives — the property that keeps the final answer
    exact), the false-positive rate at 16 bits/item stays far under 1%,
    and the end-to-end prefilter+verify equals the plain exact semi-join."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.operators import bloom

    hist = spark.range(0, 20000).selectExpr("md5(cast(id as string)) AS fp")
    batch = spark.range(15000, 40000).selectExpr(
        "md5(cast(id as string)) AS fp", "id"
    )

    m = bloom.sized_m_bits(20000)
    assert m >= 20000 * 16 and (m & (m - 1)) == 0  # pow2, >=16 bits/item
    words = bloom.bloom_build(hist, "fp", m)
    assert len(words) == m // 64

    probed = batch.withColumn(
        "maybe", bloom.bloom_maybe_contains(F.col("fp"), words, m)
    )
    rows = probed.groupBy((F.col("id") < 20000).alias("is_dup")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("maybe").cast("int")).alias("n_maybe"),
    ).collect()
    by_dup = {r["is_dup"]: r for r in rows}
    # no false negatives: all 5000 true members flagged maybe
    assert by_dup[True]["n"] == 5000 and by_dup[True]["n_maybe"] == 5000
    # false positives: < 1% of the 20000 genuinely-new items
    assert by_dup[False]["n_maybe"] < 200

    got = bloom.bloom_prefilter_dedup(hist, batch, col="fp")
    exact = batch.join(hist.distinct(), "fp", "left_semi")
    assert got.count() == 5000
    assert got.exceptAll(exact).count() == 0 and exact.exceptAll(got).count() == 0


def test_bloom_bit_positions_deterministic_and_in_range(spark):
    """Double-hashed positions are stable across partitioning layouts
    and always land in [0, m)."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.operators import bloom

    m = 1 << 14
    df = spark.range(0, 1000).selectExpr("md5(cast(id as string)) AS fp")
    pos = F.array(*bloom._bit_positions(F.col("fp"), m, 7))
    a = df.repartition(1).select("fp", pos.alias("p")).collect()
    b = df.repartition(13).select("fp", pos.alias("p")).collect()
    assert {r["fp"]: r["p"] for r in a} == {r["fp"]: r["p"] for r in b}
    assert all(0 <= x < m for r in a for x in r["p"])


def test_topk_sketch_build_merge_guarantees(spark):
    """SpaceSaving-family invariants: a single-batch sketch is an exact
    truncation; the merge keeps every estimate within [true, true+err];
    NO key with true count > merged err can be absent; and a merge with
    k >= vocabulary is exactly the global count table."""
    from bw_new_data_integration_spark.operators.sketch import (
        topk_sketch_build,
        topk_sketch_merge,
    )

    # two batches with overlapping, skewed vocabularies
    rows = (
        [Row(b="b1", t="hot")] * 50 + [Row(b="b1", t="warm")] * 20
        + [Row(b="b1", t=f"rare{i}") for i in range(10)]
        + [Row(b="b2", t="hot")] * 30 + [Row(b="b2", t="tepid")] * 25
        + [Row(b="b2", t=f"rare{i}") for i in range(5, 15)]
    )
    df = spark.createDataFrame(rows)

    # exact when k covers the vocabulary
    full = topk_sketch_merge(topk_sketch_build(df, "b", "t", k=100), None, k=100)
    r = full.collect()[0]
    assert r["err"] == 0 and r["n_total"] == len(rows)
    got = dict(zip(r["terms"], r["counts"]))
    true = {x["t"]: x["n"] for x in df.groupBy("t").agg(F.count("*").alias("n")).collect()}
    assert got == true

    # tight k: bounds hold and no hot key is missing
    k = 3
    merged = topk_sketch_merge(topk_sketch_build(df, "b", "t", k=k), None, k=k)
    m = merged.collect()[0]
    assert len(m["terms"]) == k
    for t, est in zip(m["terms"], m["counts"]):
        assert true[t] <= est <= true[t] + m["err"], (t, est, true[t], m["err"])
    for t, c in true.items():
        if c > m["err"]:
            assert t in m["terms"], f"hot key {t} (count {c} > err {m['err']}) missing"

    # per-batch build is an exact truncation with err = (k+1)-th count
    b1 = {s["b"]: s for s in topk_sketch_build(df, "b", "t", k=2).collect()}
    assert list(b1["b1"]["terms"]) == ["hot", "warm"]
    assert list(b1["b1"]["counts"]) == [50, 20]
    assert b1["b1"]["err"] == 1  # first dropped rare term
    assert b1["b1"]["n_total"] == 80


def test_hot_keys_advisor_from_sketch(spark):
    """The salting advisor reads ONLY the sketch: keys with estimated
    share >= min_share surface (upper-bound semantics: may over-report,
    never misses a key whose true share exceeds min_share + err/n)."""
    from bw_new_data_integration_spark.operators.sketch import (
        hot_keys,
        topk_sketch_build,
        topk_sketch_merge,
    )

    rows = (
        [Row(b="b1", t="hot")] * 60 + [Row(b="b1", t=f"r{i}") for i in range(20)]
        + [Row(b="b2", t="hot")] * 40 + [Row(b="b2", t=f"s{i}") for i in range(30)]
    )
    df = spark.createDataFrame(rows)
    merged = topk_sketch_merge(topk_sketch_build(df, "b", "t", k=4), None, k=4)
    advice = {r["key"]: r["share_ub"] for r in hot_keys(merged, min_share=0.3).collect()}
    n = len(rows)
    assert "hot" in advice and advice["hot"] >= 100 / n  # true share 2/3
    assert all(k == "hot" or v >= 0.3 for k, v in advice.items())
    # a uniform key space advises nothing at a high threshold
    uni = spark.createDataFrame([Row(b="b", t=f"k{i % 40}") for i in range(400)])
    m2 = topk_sketch_merge(topk_sketch_build(uni, "b", "t", k=40), None, k=40)
    assert hot_keys(m2, min_share=0.3).count() == 0


def test_spread_rebalances_lopsided_union(spark):
    """The sf1 footgun VERDICT r6 #6: a union of 1 fat scan partition +
    N near-empty ones passes a partition-COUNT check but serializes the
    digest work (10x wall regression observed). _spread must now detect
    the multi-leaf plan and rebalance WITHOUT caller changes; a
    single-scan input with enough partitions stays shuffle-free."""
    from bw_new_data_integration_spark.operators.dedup import _spread

    par = spark.sparkContext.defaultParallelism

    def part_sizes(df):
        return df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()

    fat = spark.range(2000).select(F.col("id").alias("doc_id")).coalesce(1)
    thin = (
        spark.range(2000, 2000 + par)
        .select(F.col("id").alias("doc_id"))
        .repartition(par)
    )
    lopsided = fat.unionByName(thin)
    assert lopsided.rdd.getNumPartitions() >= par  # passes the old COUNT check
    assert max(part_sizes(lopsided)) >= 2000  # ...but one task holds the work

    out = _spread(lopsided, "doc_id")
    sizes = part_sizes(out)
    assert len(sizes) == par
    assert max(sizes) < 2000 * 0.5  # fat partition actually spread

    # single-scan input with enough partitions: untouched (no shuffle)
    ok = spark.range(1000).select(F.col("id").alias("doc_id")).repartition(par)
    assert _spread(ok, "doc_id") is ok


def test_spread_connect_fallback_estimators(spark, tmp_path):
    """The Spark-Connect fallback probes _spread uses when df.rdd /
    sparkContext don't exist (ADVICE r8): size-conf parsing and the
    bytes-over-maxPartitionBytes scan-width estimate. The estimate may
    only UNDER-state width (errs toward rebalancing, the safe side)."""
    from bw_new_data_integration_spark.operators.dedup import (
        _est_scan_partitions,
        _size_to_bytes,
    )

    assert _size_to_bytes("134217728") == 134217728
    assert _size_to_bytes("128m") == 128 << 20
    assert _size_to_bytes("128MB") == 128 << 20
    assert _size_to_bytes("1g") == 1 << 30
    assert _size_to_bytes("garbage") is None

    p = str(tmp_path / "est")
    spark.range(50_000).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    est = _est_scan_partitions(df)
    assert est is not None and 1 <= est <= df.rdd.getNumPartitions()
    # non-file-backed plans are unestimable -> None (caller rebalances)
    assert _est_scan_partitions(spark.range(10)) is None


def test_kmeans_seeding_is_partial_topk_not_global_sort(spark):
    """VERDICT r7 #5 adjudication evidence: seed selection is NOT a
    full O(N log N) sort — Catalyst compiles orderBy().limit(k) to
    TakeOrderedAndProject (per-partition bounded heap, k rows per
    partition to the driver, zero shuffle stages). Pin the plan shape
    AND bit-reproducibility of the seeds across partition layouts."""
    import contextlib
    import io

    from bw_new_data_integration_spark.operators.kmeans import seed_centroids

    base = spark.range(5000).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (j + 3)) % 97).cast("float") for j in range(4)]).alias(
            "embedding"
        ),
    )
    a = seed_centroids(base.repartition(3), 7, "vec_id", "embedding")
    b = seed_centroids(base.repartition(64), 7, "vec_id", "embedding")
    assert a == b and len(a) == 7
    assert a[0] == [0.0, 0.0, 0.0, 0.0]  # vec_id 0 is the smallest seed

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        base.select("vec_id", "embedding").orderBy("vec_id").limit(7).explain()
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global-sort stage anywhere in the plan


def test_semdedup_prunes_known_near_dups(spark):
    """Keep-min-id semantics on a hand-built corpus: exact and near
    duplicates collapse to the lowest id; the kept set has no
    within-cluster pair >= threshold; the result is partition-stable."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.operators import semdedup as sd

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # k=2 seed A
        (1, [0.0, 1.0, 0.0, 0.0]),   # k=2 seed B
        (2, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 0
        (3, [0.9, 0.05, 0.0, 0.0]),  # near-dup of 0 (cos ~0.998)
        (4, [0.0, 0.9, 0.1, 0.0]),   # near-dup of 1 (cos ~0.994)
        (5, [0.0, 0.0, 1.0, 0.0]),   # no near-dup
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    kept, pruned = sd.semdedup(spark, emb, k=2, threshold=0.95, dim=4)
    kept_ids = {r["vec_id"] for r in kept.collect()}
    pruned_ids = {r["vec_id"] for r in pruned.collect()}
    assert kept_ids == {0, 1, 5}
    assert pruned_ids == {2, 3, 4}

    # postcondition: no surviving within-cluster pair >= threshold
    from bw_new_data_integration_spark.functions.vectors import norm

    survivors = kept.withColumn("__norm", norm(F.col("embedding"), 4))
    assert sd.within_cluster_near_dups(survivors, threshold=0.95, dim=4).count() == 0

    # partition-layout determinism
    kept2, pruned2 = sd.semdedup(spark, emb.repartition(7), k=2, threshold=0.95, dim=4)
    assert {r["vec_id"] for r in kept2.collect()} == kept_ids
    assert {r["vec_id"] for r in pruned2.collect()} == pruned_ids


def test_inverted_index_caps_postings_to_smallest_ids(spark):
    """Posting lists hold the cap smallest doc ids; df/tf stay exact."""
    from bw_new_data_integration_spark.operators import corpus

    rows = [(i, "common " + ("rare " if i == 7 else "")) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = corpus.inverted_index(docs, top_terms=2, posting_cap=5)
    by_term = {r["term"]: r for r in out.collect()}
    assert by_term["common"]["df"] == 50 and by_term["common"]["tf_total"] == 50
    assert by_term["common"]["postings"] == "0,1,2,3,4"  # capped, smallest ids
    assert by_term["rare"]["df"] == 1 and by_term["rare"]["postings"] == "7"


def test_temperature_thresholds_flatten_shares(spark):
    """tau=0.5 moves shares toward uniform without oversampling: the
    binding group keeps rate ~1, quotas follow sqrt proportions."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.operators import sampling

    thr = sampling.temperature_thresholds({"a": 900, "b": 100})
    # weights 3e7 / 1e7; binding group b caps T at 400 -> quotas 300/100
    assert thr["b"] == 1 << 32  # rate exactly 1.0: never downsample the binder
    assert thr["a"] == 300 * (1 << 32) // 900

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "a").otherwise("b").alias("lang"),
    )
    kept = sampling.temperature_mixture(df, "lang", "doc_id", temperature=0.5)
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["b"] == 100  # binder kept whole
    assert 250 <= got["a"] <= 350  # hash threshold ~quota 300
    # determinism across partition layouts
    kept13 = sampling.temperature_mixture(df.repartition(13), "lang", "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in kept13.collect()
    )


def test_time_travel_reads_every_version(spark, tmp_path):
    """Each commit's snapshot stays addressable; out-of-range is None."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

    t = ParquetKeyedTable(str(tmp_path / "t"), ["k"])
    t.overwrite(spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("v")))
    t.upsert(spark, spark.range(5, 8).select(F.col("id").alias("k"), F.lit(2).alias("v")))
    assert t.read(spark, version=0).count() == 5
    assert t.read(spark, version=1).count() == 8
    assert t.read(spark).count() == 8
    assert t.read(spark, version=99) is None


def test_skyline_2d_matches_definition_and_keeps_ties(spark):
    """Sort-filter skyline output equals the NOT EXISTS definition on a
    hand-built frontier, duplicates of a skyline point all survive, and
    the plan contains no nested-loop self-join."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.operators.skyline import skyline_2d

    rows = [
        (1, 1.0, 9), (2, 2.0, 7), (3, 3.0, 5),   # frontier
        (4, 3.0, 5),                              # duplicate of 3: kept
        (5, 2.0, 8), (6, 3.0, 6), (7, 4.0, 5),   # dominated
        (8, 1.0, 10),                             # same x as 1, worse y
        (9, None, 1),                             # NULL coordinate: excluded
    ]
    df = spark.createDataFrame(rows, "id bigint, x double, y int")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    assert got == {1, 2, 3, 4}

    plan = skyline_2d(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_bloom_probe_join_agrees_with_literal_probe(spark):
    """The two probe implementations — literal-array expression (small
    filters) and sparse-word broadcast join (production) — flag the
    identical maybe-set for the same built filter."""
    from pyspark.sql import functions as F

    from bw_new_data_integration_spark.operators import bloom

    hist = spark.range(0, 3000).selectExpr("md5(cast(id as string)) AS fp")
    batch = spark.range(2000, 4000).selectExpr("md5(cast(id as string)) AS fp")
    m = bloom.sized_m_bits(3000)
    words = bloom.bloom_build(hist, "fp", m)
    lit_set = {
        r["fp"]
        for r in batch.filter(
            bloom.bloom_maybe_contains(F.col("fp"), words, m)
        ).collect()
    }
    join_set = {r["fp"] for r in bloom.bloom_probe_join(batch, "fp", words, m).collect()}
    assert lit_set == join_set
    # all 1000 true members present in both (no false negatives)
    true_members = {
        r["fp"] for r in spark.range(2000, 3000).selectExpr("md5(cast(id as string)) AS fp").collect()
    }
    assert true_members <= join_set


def test_remove_boilerplate_lines_semantics(spark):
    """Line order is preserved on reassembly; the threshold counts
    DISTINCT documents (a line repeated 50x inside one doc is not
    boilerplate); an all-boilerplate doc survives as the empty string
    with exact drop accounting."""
    from bw_new_data_integration_spark.operators.corpus import remove_boilerplate_lines

    footer = "Copyright Example"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha\nbeta\n" + footer),
            Row(doc_id=2, text="gamma\n" + footer + "\ndelta"),
            Row(doc_id=3, text="\n".join(["echo"] * 50)),  # intra-doc repeat, df=1
            Row(doc_id=4, text=footer + "\n  copyright example  "),  # norm-equal, all boiler
        ]
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert out[1]["text_clean"] == "alpha\nbeta"
    assert out[2]["text_clean"] == "gamma\ndelta"  # order kept around the dropped middle line
    assert out[3]["text_clean"] == "\n".join(["echo"] * 50)  # df=1: kept despite 50 repeats
    assert (out[4]["text_clean"], out[4]["n_lines_kept"], out[4]["n_lines_dropped"]) == ("", 0, 2)
    assert out[1]["n_lines_dropped"] == 1


def test_fix_mojibake_repairs_and_protects(spark):
    """The inverse transcode fires only on marker+validity: mojibake is
    repaired byte-exactly, genuinely accented text and ASCII pass
    through, and marker-bearing text whose Latin-1 bytes are NOT valid
    UTF-8 is left alone (the guard that keeps decode from throwing)."""
    from bw_new_data_integration_spark.functions.text import fix_mojibake

    cases = [
        ("cafÃ© rÃ©sumÃ© niÃ±o", "café résumé niño"),  # classic double-encoding
        ("café résumé niño", "café résumé niño"),      # genuine accents: untouched
        ("plain ascii", "plain ascii"),
        ("Ã stray marker", "Ã stray marker"),          # marker but invalid UTF-8 bytes
        ("donâ€™t â€” â€œquotedâ€\x9d", "don’t — “quoted”"),  # cp1252 specials (ADVICE r6)
        ("Ã marker 🙂 emoji", "Ã marker 🙂 emoji"),    # unmappable char: no crash, untouched
        ("Ã 日本語テキスト", "Ã 日本語テキスト"),        # CJK next to marker: untouched
        ("å¤§å­¦ æ—¥æœ¬", "大学 日本"),                  # CJK mojibake (valid UTF-8 bytes): repaired
        ("I love ðŸ™‚", "I love 🙂"),                   # 4-byte emoji mojibake (review r7): repaired
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = [r["f"] for r in df.select(fix_mojibake(F.col("s")).alias("f")).collect()]
    assert got == [want for _, want in cases]


def test_quality_percentile_filter_quotas_and_ties(spark):
    """ceil quota per group (4 rows at 0.3 keeps 2), singleton groups
    always keep their row, and equal scores break ties on doc_id."""
    from bw_new_data_integration_spark.operators.sampling import quality_percentile_filter

    rows = [Row(doc_id=i, source="a", score=10 - i) for i in range(4)]  # distinct scores
    rows += [Row(doc_id=100 + i, source="b", score=5) for i in range(4)]  # all tied
    rows += [Row(doc_id=999, source="c", score=0)]  # singleton
    out = quality_percentile_filter(
        spark.createDataFrame(rows), "score", "source", 0.3
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert sorted(by_src["a"]) == [0, 1]       # top-2 of 4 (ceil(1.2) = 2)
    assert sorted(by_src["b"]) == [100, 101]   # ties resolved by doc_id
    assert by_src["c"] == [999]                # ceil(0.3) = 1: never empties a group


def test_linear_text_classifier_learns_and_is_bit_deterministic(spark):
    """Disjoint-vocabulary classes are separated at >= 95% train
    accuracy; refitting yields bit-identical weights (fixed-point
    gradient sums + rational sigmoid); scoring is total — a token-less
    doc still comes back, at the bias-only probability; tf mode and
    bad-mode validation."""
    import pytest as _pytest

    from bw_new_data_integration_spark.operators.classifier import (
        _fast_sigmoid,
        featurize_hashed,
        fit_linear_text_classifier,
        score_linear_text_classifier,
    )

    pos_v = ["wiki", "cite", "reference", "article", "encyclopedia", "notable"]
    neg_v = ["buy", "click", "free", "casino", "winner", "offer"]
    common = ["the", "a", "of", "and", "to", "in"]
    rows = []
    for i in range(200):
        v = pos_v if i % 2 == 0 else neg_v
        words = [v[(i + j) % 6] for j in range(10)] + [common[(i + j) % 6] for j in range(6)]
        rows.append(Row(doc_id=i, text=" ".join(words), y=1 if i % 2 == 0 else 0))
    rows.append(Row(doc_id=9999, text="", y=0))  # token-less
    df = spark.createDataFrame(rows)

    m = fit_linear_text_classifier(spark, df, "y", dim=512, iters=6, lr=2.0)
    sc = score_linear_text_classifier(spark, df, m)
    got = {r["doc_id"]: r["prob"] for r in sc.collect()}
    assert len(got) == 201  # total scoring, token-less doc included
    # the bias rides the fixed-point margin aggregate, so the engine's
    # bias-only score uses the floor-quantized b (2^-40 granularity)
    import math

    assert got[9999] == _fast_sigmoid(math.floor(m["b"] * 2**40) / 2**40)
    acc = sum(
        1 for r in rows if r.doc_id != 9999 and (got[r.doc_id] > 0.5) == (r.y == 1)
    ) / 200
    assert acc >= 0.95
    assert all(0.0 < p < 1.0 for p in got.values())

    m2 = fit_linear_text_classifier(spark, df, "y", dim=512, iters=6, lr=2.0)
    assert m2["w"] == m["w"] and m2["b"] == m["b"]  # bit-identical refit

    tf = featurize_hashed(df, dim=512, mode="tf").collect()
    assert all(0.0 < r["x"] <= 1.0 for r in tf)
    with _pytest.raises(ValueError, match="unknown mode"):
        featurize_hashed(df, mode="nope").collect()


def test_duplicate_spans_semantics(spark):
    """Substring dedup: a 12-token region copied between two docs
    yields ONE maximal merged span at the right 1-based positions in
    each; within-doc repetition of a k-gram also counts (occurrences,
    not distinct docs); docs shorter than k never produce spans; two
    separate copied regions stay two spans."""
    from bw_new_data_integration_spark.operators.dedup import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 toks
    other = "one two three four five six seven eight nine ten"  # 10 toks, unique
    rows = [
        Row(doc_id=1, text=f"{other} {shared}"),               # span at 11..22
        Row(doc_id=2, text=f"{shared} unique1 unique2"),        # span at 1..12
        Row(doc_id=3, text="w1 w2 w3 w4 w5 w6 w7 w8 " * 2),    # within-doc repeat
        Row(doc_id=4, text="short doc"),                        # < k tokens
        Row(doc_id=5, text=f"{shared} xray yankee zulu {shared}"),  # two regions
    ]
    out = duplicate_spans(spark.createDataFrame(rows), k=8).collect()
    spans = {}
    for r in out:
        spans.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for v in spans.values():
        v.sort()
    assert spans[1] == [(11, 22)]
    assert spans[2] == [(1, 12)]
    assert 3 in spans  # within-doc duplicated windows detected
    assert 4 not in spans
    assert spans[5] == [(1, 12), (16, 27)]


def test_cut_duplicate_spans_first_occurrence_policy(spark):
    """Rewrite semantics: the globally-first occurrence (min doc_id,
    position) keeps its text; later copies lose exactly the duplicated
    region; original token case is preserved while matching is
    case-insensitive; short and empty docs pass through with zero
    cuts."""
    from bw_new_data_integration_spark.operators.dedup import cut_duplicate_spans

    shared = "Alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        Row(doc_id=1, text=f"one two three {shared}"),
        Row(doc_id=2, text=f"{shared.upper()} four five"),  # case-insensitive match
        Row(doc_id=3, text="tiny doc"),
        Row(doc_id=4, text=""),
    ]
    out = {r["doc_id"]: r for r in cut_duplicate_spans(spark.createDataFrame(rows), k=8).collect()}
    assert out[1]["text_dedup"] == f"one two three {shared}"  # first occurrence intact
    assert out[2]["text_dedup"] == "four five"                # copy cut, original case gone with it
    assert (out[2]["n_tokens_kept"], out[2]["n_tokens_cut"]) == (2, 12)
    assert out[3] == Row(doc_id=3, text_dedup="tiny doc", n_tokens_kept=2, n_tokens_cut=0)
    assert out[4] == Row(doc_id=4, text_dedup="", n_tokens_kept=0, n_tokens_cut=0)


def test_kmv_sketch_merge_and_jaccard(spark):
    """KMV properties: a group with < k distinct values estimates
    EXACTLY; merging per-group sketches equals sketching the union
    (the rollup-without-rescan property); the Jaccard estimator is
    exact when sketches are not saturated; estimates are deterministic
    across runs."""
    from bw_new_data_integration_spark.operators.sketch import (
        kmv_build, kmv_estimate, kmv_jaccard, kmv_merge)

    rows = [Row(g="a", v=f"x{i}") for i in range(40)]          # 40 distinct
    rows += [Row(g="b", v=f"x{i}") for i in range(20, 80)]     # 60 distinct, 20 shared
    df = spark.createDataFrame(rows)
    k = 64
    sk = kmv_build(df, "g", "v", k)
    est = {r["g"]: r["e"] for r in sk.select("g", kmv_estimate(F.col("sketch"), k).alias("e")).collect()}
    assert est == {"a": 40.0, "b": 60.0}  # sub-k sketches are exact

    # merge(a, b) == sketch of the union of values
    merged = sk.groupBy().agg(F.collect_list("sketch").alias("s")).select(
        kmv_merge(F.col("s"), k).alias("m")).collect()[0]["m"]
    direct = kmv_build(df.withColumn("g", F.lit("all")), "g", "v", k).collect()[0]["sketch"]
    assert merged == direct
    assert len(merged) == 64  # 80 distinct values saturate k=64

    # Jaccard: |A∩B|=20, |A∪B|=80 -> 0.25; unsaturated inputs give the
    # merged-sketch estimator 64 samples of the union
    jac = (
        sk.groupBy().pivot("g").agg(F.first("sketch"))
        .select(kmv_jaccard(F.col("a"), F.col("b"), k).alias("j")).collect()[0]["j"]
    )
    assert abs(jac - 0.25) <= 0.12  # 64-sample estimate of 0.25

    sk2 = {r["g"]: r["sketch"] for r in kmv_build(df, "g", "v", k).collect()}
    assert sk2 == {r["g"]: r["sketch"] for r in sk.collect()}  # bit-deterministic


def test_decontaminate_cuts_eval_collisions_only(spark):
    """Decontamination rewrite: a training doc containing an eval
    passage loses exactly that span (case-insensitively matched);
    clean docs and docs sharing < k consecutive tokens with eval are
    untouched; every training doc comes back exactly once."""
    from bw_new_data_integration_spark.operators.contamination import decontaminate

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    rows = [
        Row(doc_id=1, text=f"intro words {passage} outro"),
        Row(doc_id=2, text=f"INTRO {passage.upper()} OUTRO"),   # case-insensitive hit
        Row(doc_id=3, text="the quick brown fox sits still today with friends"),  # <k overlap
        Row(doc_id=4, text="completely unrelated content here now ok fine yes sure"),
    ]
    train = spark.createDataFrame(rows)
    eval_df = spark.createDataFrame([Row(text=passage)])
    out = {r["doc_id"]: r for r in decontaminate(train, eval_df, k=8).collect()}
    assert len(out) == 4
    assert out[1]["text_decontaminated"] == "intro words outro"
    assert out[1]["n_tokens_cut"] == 10
    assert out[2]["text_decontaminated"] == "INTRO OUTRO"  # original case kept around the cut
    assert out[3]["n_tokens_cut"] == 0 and out[4]["n_tokens_cut"] == 0


def test_incremental_duplicate_spans_equals_full_corpus(spark):
    """When history ids precede batch ids, the incremental path
    (stored gram index + batch-only processing) must return exactly
    what full-corpus cut_duplicate_spans returns for the batch docs —
    the no-rescan property can't be allowed to change answers. Also:
    a batch gram present in history is cut from EVERY batch occurrence
    (history keeps), while a batch-only duplicate keeps its first
    batch occurrence."""
    from bw_new_data_integration_spark.operators.dedup import (
        cut_duplicate_spans, gram_index, incremental_duplicate_spans)

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
    fresh = "nu xi omicron pi rho sigma tau upsilon phi chi"             # 10 toks
    history = [Row(doc_id=i, text=(f"h{i} filler {shared}" if i == 1 else f"h{i} mundane text here we go again ok fine"))
               for i in range(1, 4)]
    batch = [
        Row(doc_id=11, text=f"b one {shared} tail"),       # collides with history -> cut
        Row(doc_id=12, text=f"b two {fresh} end"),          # first batch occurrence -> keeps
        Row(doc_id=13, text=f"b three {fresh} end2"),       # second batch occurrence -> cut
    ]
    hist_df, batch_df = spark.createDataFrame(history), spark.createDataFrame(batch)
    inc = {r["doc_id"]: r for r in incremental_duplicate_spans(
        gram_index(hist_df, k=8), batch_df, k=8).collect()}
    assert inc[11]["text_dedup"] == "b one tail"
    assert inc[12]["n_tokens_cut"] == 0
    assert inc[13]["text_dedup"] == "b three end2"

    full = {r["doc_id"]: r for r in cut_duplicate_spans(
        hist_df.unionByName(batch_df), k=8).collect() if r["doc_id"] >= 11}
    assert {i: (r["text_dedup"], r["n_tokens_kept"], r["n_tokens_cut"]) for i, r in inc.items()} == \
           {i: (r["text_dedup"], r["n_tokens_kept"], r["n_tokens_cut"]) for i, r in full.items()}

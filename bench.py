#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline set (each query fully
materialized via a count/collect action). Per-query seconds land in
``queries``. The set exercises the engine's hot paths: wide aggregation,
broadcast joins, window functions, merge/upsert, dedup + minhash LSH,
similarity search, and text analytics.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bw_new_data_integration_spark import queries as q
from bw_new_data_integration_spark.session import get_spark

HEADLINE = [
    "a1_pricing_summary",
    "a2_grouped_5dim",
    "a4_yoy_sales",
    "j2_broadcast_lookup",
    "j4_merge_upsert",
    "k1_dedupe_latest",
    "f6_trailing_window",
    "o2_top_k_per_group",
    "sessionize_events",
]
# beyond-reference training-data ops join the headline set as they land
OPTIONAL = [
    "dedup_exact_docs",
    "dedup_bloom_prefilter",
    "dedup_lsh_candidates",
    "dedup_pipeline_e2e",
    "ann_brute_topk_exact_baseline",
    "ann_lsh_topk",
    "text_quality",
    "pipeline_daily_sales",
    "pipeline_sales_channel",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "j5_asof_join",
    "j6_range_join_counts",
    "rollup_hierarchy",
    "j8_anti_join",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "a8_approx_distinct_sketch",
    "sample_deterministic_split",
    "funnel_conversion",
    "quantile_binning",
    "embedding_centroids",
    "er_fuzzy_match",
    "profile_table",
    "profile_table_approx",
    "s9_odata_scan",
    "split_leakage_free",
    "split_neardup_safe",
    "contamination_check",
    "pii_redaction",
    "s8_excel_roundtrip",
    "k5_schema_evolution",
    "s1_xmla_partitioned",
    "s1_xmla_partitioned_dist",
    "s11_orc_roundtrip",
    "mixture_balance",
    "pack_sequences",
    "validate_expectations",
    "scd2_dimension",
    "scd2_point_in_time",
    "o7_activity_streaks",
    "kmeans_embeddings",
    "semdedup_prune",
    "inverted_index_topdf",
    "mixture_temperature",
    "o12_skyline_pareto",
    "ann_ivf_trained",
    "chunk_documents",
    "shuffle_shards",
    "ann_lsh_multiprobe",
    "mdx_template_backfill",
    "dedup_lsh_candidates_capped",
    "tfidf_top_terms",
    "unigram_rarity_score",
    "training_corpus_e2e",
    "s12_jsonl_roundtrip",
    "s14_xml_roundtrip",
    "k8_data_skipping",
    "boilerplate_line_removal",
    "text_mojibake_repair",
    "quality_percentile_filter",
    "quality_classifier_e2e",
    "k9_zorder_skipping",
    "dedup_substring_spans",
    "dedup_substring_rewrite",
    "kmv_distinct_sketch",
    "decontamination_rewrite",
    "dedup_substring_incremental",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_order_count_distribution",
    "q21_waiting_supplier",
    "mm_image_pixel_stats",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q12_late_shipment_priority",
    "q16_supplier_part_counts",
    "q20_part_promotion",
    "mm_video_frames",
    "mm_jpeg_color_roundtrip",
    "training_corpus_e2e_extended",
    "salted_skew_aggregate",
    "heavy_hitters_sketch",
    "streaming_heavy_hitters",
    "streaming_sessionize",
    "streaming_windowed_counts",
    "streaming_dedup",
    "streaming_dedup_unbounded_baseline",
    "skew_advisor_salted_e2e",
    "k1_dedupe_latest_window_baseline",
    "k10_range_merge_scoping",
    "k11_incremental_rollup",
    "streaming_matview_e2e",
    "k12_minmax_rollup",
    "k13_pipeline_matview",
    "k14_yaml_pipeline_matview",
    "k15_commit_change_feed",
    "k16_change_driven_sync",
    "k17_daily_sales_full_matview",
    "k18_mor_lifecycle",
    "streaming_dedup_drip",
    "k19_mor_partitioned_lifecycle",
    "k20_delta_export_purge",
    "k22_compact_where",
    "s15_delta_import",
    "s16_delta_incremental_sync",
]


# FROZEN common-core set (VERDICT r6 #5): the cross-round comparison
# basis. These 31 production-shape queries existed in both the r5 and
# r6 records; `common_core_wall` is their sum and is the ONLY number
# meant for round-over-round comparison (the full wall grows whenever
# coverage grows, so headline-vs-headline is meaningless). Append-only
# discipline: never remove or rename an entry — a dropped query would
# silently deflate the series. tools/bench_compare.py keys off this
# list when both records carry it.
COMMON_CORE = [
    "ann_ivf_trained",
    "ann_lsh_multiprobe",
    "ann_lsh_topk",
    "contamination_check",
    "dedup_lsh_candidates",
    "dedup_lsh_candidates_capped",
    "dedup_pipeline_e2e",
    "k1_dedupe_latest",
    "kmeans_embeddings",
    "mdx_template_backfill",
    "mm_image_pixel_stats",
    "pipeline_daily_sales",
    "profile_table_approx",
    "profile_table_approx_bare",
    "q10_returned_items",
    "q18_large_orders",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "s12_jsonl_roundtrip",
    "s1_xmla_partitioned",
    "s1_xmla_partitioned_dist",
    "s9_odata_scan",
    "split_neardup_safe",
    "tfidf_top_terms",
    "training_corpus_e2e",
    "upsert_daily_sales",
    "upsert_incremental_window",
]


# Non-registry metrics main() produces beyond the registry queries —
# the chunked orchestrator (below) must enumerate them to cover the
# whole sweep. skew_sketch_build is a byproduct of skew_agg_advised and
# rides in its chunk.
SPECIAL_METRICS = [
    "upsert_daily_sales",
    "upsert_incremental_window",
    "range_merge_hist1x",
    "range_merge_hist10x",
    "matview_refresh_1x",
    "matview_refresh_10x",
    "profile_table_approx_bare",
    "skew_agg_plain",
    "skew_agg_salted",
    "skew_agg_advised",
    "xmla_backfill39_seq_baseline",
    "xmla_backfill39_dist",
]


def chunk_metrics(names: list[str], size: int) -> list[list[str]]:
    """Split the sweep's metric list into order-preserving chunks of at
    most ``size`` (VERDICT r11 #4 / r12 #1: the single-process 132-metric
    sweep accumulated JVM/heap state that inflated late queries 1.2-1.3x;
    each chunk runs in a fresh process). Pure — unit-pinned in
    tests/test_bench_record.py."""
    if size <= 0:
        return [list(names)]
    return [list(names[i : i + size]) for i in range(0, len(names), size)]


# Labeled comparison twins are timed and recorded but EXCLUDED from the
# headline wall total (VERDICT r5 #1): a `*_baseline` is a deliberately
# weaker plan kept to prove its production twin's speedup (exact
# all-pairs vs LSH, sequential driver loop vs distributed fetch). The
# headline measures production-shape queries only. Matching names still
# run, still gate, and still appear in `queries`/`excluded_from_wall`.
def _excluded_from_wall(name: str) -> bool:
    return "_baseline" in name or name.startswith("xmla_backfill39")


# --- host-drift calibration (VERDICT r10 #1) --------------------------------
# The shared box's speed changed 1.37x WITHIN round 10 (same code, solo
# probes; docs/ROUND10_NOTES.md §5), so raw walls are not comparable
# across rounds without a per-record speed reference. Every record now
# carries a fixed two-part calibration probe taken at run START and END:
#   - python_spin_ms: a pure-Python sha256+arithmetic loop (no Spark, no
#     disk) — single-core interpreter/CPU speed, the signal that exposed
#     the r10 drift;
#   - spark_job_ms:   a tiny constant-input Spark job (range→sum, no
#     shuffle read) — JVM + scheduler + multi-core throughput.
# drift_factor = geometric mean of (measured / CAL_REF) over both parts,
# averaged over start and end probes. Normalized walls = raw / drift.
# CAL_REF is PINNED from the r11 round-open quiet window (min-of-5 on an
# idle box, steal ~0%); it is the record's fixed unit of "one box-second"
# and must NOT be re-pinned casually — re-pinning rescales the whole
# normalized series (append a dated note here if it ever changes).
CAL_REF = {
    "python_spin_ms": 95.0,
    "spark_job_ms": 150.0,
    "pinned": "r11 round-open quiet floor (docs/ROUND11_NOTES.md)",
}


def _python_spin_ms() -> float:
    import hashlib

    blob = b"x" * 64
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(200_000):
        h.update(blob)
    acc = 0
    for i in range(1_500_000):
        acc = (acc * 31 + i) % 1000003
    return (time.perf_counter() - t0) * 1000.0


def calibration_probe(spark=None, samples: int = 5) -> dict:
    """Min-of-N host-speed probe (min: interference only ever slows)."""
    out = {"python_spin_ms": round(min(_python_spin_ms() for _ in range(samples)), 1)}
    if spark is not None:
        # untimed JIT warmup ×6: the C2 tier keeps recompiling this job
        # for many iterations (measured: floor 650ms after 3 runs,
        # 180ms after ~15), and the probe must measure the BOX, not the
        # JVM's compile state — a cold-JVM start probe has to reach the
        # same steady state the end-of-run probe gets for free
        for _ in range(12):
            spark.range(30_000_000).selectExpr("sum(id % 7)").collect()
        sp = []
        for _ in range(max(8, samples)):
            t0 = time.perf_counter()
            spark.range(30_000_000).selectExpr("sum(id % 7)").collect()
            sp.append((time.perf_counter() - t0) * 1000.0)
        out["spark_job_ms"] = round(min(sp), 1)
    return out


def drift_factor(
    probes: list[dict],
    ref: dict | None = None,
    components: tuple[str, ...] = ("python_spin_ms",),
) -> float:
    """Geometric-mean speed ratio of the probed host vs CAL_REF, >1 =
    slower box. Averages over the given probes (typically run start +
    end, so mid-run degradation is split, not ignored).

    Folds ONLY the pure-Python spin by default: the r11 sf1 run showed
    the Spark probe is contaminated by JVM compile state, not just box
    speed — after ~50 queries the end-of-run probe read 74 ms vs the
    150 ms pinned floor (no amount of fresh-JVM warmup reaches the
    fully-hot state), while the spin component stayed within 10% of its
    pin. spark_job_ms is still RECORDED in every calibration block as
    context, just not folded. Pure — unit-pinned in
    tests/test_bench_record.py."""
    import math

    ref = ref or CAL_REF
    ratios: list[float] = []
    for p in probes:
        parts = [p[k] / ref[k] for k in components if p.get(k) and ref.get(k)]
        if parts:
            ratios.append(math.exp(sum(math.log(x) for x in parts) / len(parts)))
    if not ratios:
        return 1.0
    return round(sum(ratios) / len(ratios), 4)


def merge_partial_record(
    prev: dict,
    per_query: dict[str, float],
    excluded: list[str],
    only: set[str],
    mover_reprobe: dict,
    calibration: dict | None = None,
    noise: dict | None = None,
) -> dict:
    """Merge a targeted ``--only`` probe into an existing full-sweep (or
    partial) sidecar record, in place. The contract (ADVICE r8 +
    VERDICT r8 #6, unit-pinned in tests/test_bench_record.py):

    - per-query values upsert; untouched entries and the fuller run's
      wall totals are kept (a partial run must never clobber the sweep).
    - a query excluded in the base record that produced a value in THIS
      probe LEAVES ``excluded_from_wall`` (a monotone union would
      understate wall coverage forever).
    - a full-sweep base keeps its label (``partial_only`` stays None)
      and lists targeted re-probes under ``reprobed``; a partial base
      accumulates ``partial_only``.
    - ``common_core_sameset_wall/n`` are recomputed over the MERGED
      queries, so scale sidecars built from chunked probes self-report
      a cross-record comparable core wall.
    """
    prev["queries"].update(per_query)
    succeeded_now = set(per_query) - set(excluded)
    prev["excluded_from_wall"] = sorted(
        (set(prev.get("excluded_from_wall") or []) - succeeded_now) | set(excluded)
    )
    if prev.get("partial_only") is None:
        prev["reprobed"] = sorted(set(prev.get("reprobed") or []) | set(only))
    else:
        prev["partial_only"] = sorted(set(prev["partial_only"]) | set(only))
    prev["mover_reprobe"] = {**(prev.get("mover_reprobe") or {}), **mover_reprobe}
    merged_core = [n for n in COMMON_CORE if n in prev["queries"]]
    prev["common_core_sameset_wall"] = round(
        sum(prev["queries"][n] for n in merged_core), 3
    )
    prev["common_core_sameset_n"] = len(merged_core)
    if calibration is not None:
        # the base record's own calibration stays authoritative for its
        # normalized walls; the probe's host speed is appended so each
        # upserted value is interpretable against the box that timed it
        prev.setdefault("calibration_reprobes", []).append(
            {"probed": sorted(only), **calibration}
        )
    if noise:
        # a chunked sweep's noise probe rides in the last chunk child
        prev["noise_probe_3x"] = noise
    return prev


def refloor_movers(
    queries_before: dict[str, float],
    queries_after: dict[str, float],
    movers: list[str],
) -> tuple[dict[str, float], dict[str, dict]]:
    """Round-close re-floor: for each re-probed mover keep the MIN of
    the sweep value and the solo re-probe (interference only ever slows
    a query). Returns (floored values to upsert, evidence). Pure —
    unit-pinned in tests/test_bench_record.py."""
    floored: dict[str, float] = {}
    evidence: dict[str, dict] = {}
    for name in movers:
        before = queries_before.get(name)
        after = queries_after.get(name)
        if before is None or after is None:
            continue
        floored[name] = round(min(before, after), 3)
        evidence[name] = {
            "sweep": before,
            "solo_reprobe": after,
            "floor": floored[name],
        }
    return floored, evidence


def _run_chunked(args, chunk_size: int, repo_dir: str, sidecar: str) -> None:
    """Full-sweep orchestrator (VERDICT r11 #4 / r12 #1, now enforced in
    code): run the sweep as ``--only`` subprocesses of at most
    ``chunk_size`` metrics — a fresh JVM/Python process per chunk, each
    merging into the sidecar via merge_partial_record — then re-probe
    any common-core metric whose raw moved >1.15x vs the previous
    round's record in one more fresh process and keep the floor. The
    r12 closing sweep shipped ~9 common-core queries 1.2-1.29x inflated
    because the single 132-metric process accumulated heap/JIT state
    and the box was loaded at round close; chunking bounds the former
    and the re-floor adjudicates the latter before the record ships."""
    import subprocess

    from bw_new_data_integration_spark import queries as qq

    registry = qq.registry()
    names = HEADLINE + [o for o in OPTIONAL if o in registry] + SPECIAL_METRICS
    chunks = chunk_metrics(names, chunk_size)
    if os.path.exists(sidecar):
        os.remove(sidecar)  # fresh full sweep, never a merge into a stale record

    spin_start = round(min(_python_spin_ms() for _ in range(5)), 1)
    env = {**os.environ, "SPARK_GRAFT_BENCH_SPIN_ONLY_CAL": "1"}

    def run_child(only_names: list[str], with_noise: bool = False) -> None:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--only", ",".join(only_names), "--chunk-size", "0"]
        if args.sf is not None:
            cmd += ["--sf", args.sf]
        if with_noise:
            cmd.append("--with-noise")
        r = subprocess.run(cmd, env=env, stdout=subprocess.DEVNULL)
        if r.returncode != 0:
            sys.exit(f"bench: chunk {only_names[:2]}... failed rc={r.returncode}")

    for i, chunk in enumerate(chunks):
        print(f"# chunk {i + 1}/{len(chunks)}: {len(chunk)} metrics", file=sys.stderr)
        run_child(chunk, with_noise=(i == len(chunks) - 1))

    with open(sidecar) as fh:
        rec = json.load(fh)

    # round-close mover re-floor (>1.15x vs previous round, common core)
    round_close: dict[str, dict] = {}
    prevrec = _prev_round_record(repo_dir)
    if prevrec is not None and prevrec[1].get("sf") == rec.get("sf"):
        prev_q = prevrec[1]["queries"]
        movers = [
            n for n in COMMON_CORE
            if n in rec["queries"] and n in prev_q and prev_q[n] >= 0.15
            and rec["queries"][n] > 1.15 * prev_q[n]
        ]
        if movers:
            print(f"# round-close re-floor: {len(movers)} common-core movers "
                  f">1.15x vs r{prevrec[0]}: {movers}", file=sys.stderr)
            before = dict(rec["queries"])
            run_child(movers)
            with open(sidecar) as fh:
                rec = json.load(fh)
            floored, round_close = refloor_movers(before, rec["queries"], movers)
            for name, ev in round_close.items():
                ev["prev_round"] = prevrec[0]
                ev["prev"] = prev_q[name]
                print(f"# round_close_refloor {name}: sweep={ev['sweep']}s "
                      f"solo={ev['solo_reprobe']}s -> floor={ev['floor']}s "
                      f"({ev['floor'] / prev_q[name]:.2f}x prev)", file=sys.stderr)
            rec["queries"].update(floored)

    spin_end = round(min(_python_spin_ms() for _ in range(5)), 1)
    drift = drift_factor(
        [{"python_spin_ms": spin_start}, {"python_spin_ms": spin_end}]
    )

    # finalize: the merged sidecar IS the full sweep — recompute walls
    # over the merged queries and stamp the chunked-protocol method
    per_query = rec["queries"]
    excluded = sorted(k for k in per_query if _excluded_from_wall(k))
    total = round(sum(v for k, v in per_query.items() if k not in excluded), 3)
    core_present = [n for n in COMMON_CORE if n in per_query]
    core_wall = round(sum(per_query[n] for n in core_present), 3)
    rec.update(
        {
            "value": total,
            "excluded_from_wall": excluded,
            "partial_only": None,
            "common_core_wall": core_wall,
            "common_core_n": len(core_present),
            "common_core_sameset_wall": core_wall,
            "common_core_sameset_n": len(core_present),
            "round_close_refloor": round_close,
            "calibration": {
                "start": {"python_spin_ms": spin_start},
                "end": {"python_spin_ms": spin_end},
                "ref": CAL_REF,
                "drift_factor": drift,
            },
            "value_normalized": round(total / drift, 3),
            "common_core_wall_normalized": round(core_wall / drift, 3),
        }
    )
    rec.pop("reprobed", None)
    rec["method"] = {
        "discipline": (
            f"chunked: {len(chunks)} fresh processes of <= {chunk_size} "
            "metrics, merged via merge_partial_record; per-chunk "
            "cache-cold min-of-N per query (child method unchanged); "
            "round-close solo re-floor of common-core movers >1.15x vs "
            "previous round (floor = min(sweep, solo)); drift_factor "
            "from orchestrator python-spin probes at sweep start/end"
        ),
        "n_queries": len(per_query),
        "n_in_wall": len(per_query) - len(excluded),
        "chunks": len(chunks),
        "chunk_size": chunk_size,
    }
    with open(sidecar, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"# full record written to {sidecar}", file=sys.stderr)

    compact = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "common_core_wall": core_wall,
        "common_core_n": len(core_present),
        "common_core_wall_normalized": round(core_wall / drift, 3),
        "drift_factor": drift,
        "round_close_refloor_n": len(round_close),
        "sf": rec.get("sf"),
        "method": (
            f"chunked {len(chunks)}x<={chunk_size}-metric fresh processes, "
            "cache-cold min-of-N per query; wall excludes *_baseline twins; "
            "common-core movers >1.15x vs prev round solo-re-floored before "
            f"the record ships; full record in {os.path.basename(sidecar)}"
        ),
    }
    line = render_stdout_line(compact, per_query, os.path.basename(sidecar), repo_dir)
    print(f"# stdout JSON line length: {len(line)}", file=sys.stderr)
    print(line)


def render_stdout_line(
    compact: dict,
    per_query: dict,
    sidecar_name: str,
    repo_dir: str,
    budget: int = 1990,
) -> str:
    """Render the one-line stdout JSON so it survives the driver's
    2000-char stdout-tail capture WITHOUT value-sorted churn.

    The old last resort kept the slowest 40 queries; round over round
    that set churns, so the driver's PERF comparison fabricated phantom
    "dropped from bench" entries and lost improved fast queries
    (VERDICT r13 "What's wrong" #1). Guarantee instead: every query in
    COMMON_CORE or in the PREVIOUS round's stdout line is always
    emitted, then the remaining budget is filled slowest-first with the
    rest. A query can therefore never silently disappear from the
    stdout record between rounds; additions remain possible. The full
    map always lives in the sidecar.
    """
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) <= 1950:
        return line
    # 2-decimal values, drop the free-text method note
    q2 = {k: round(v, 2) for k, v in per_query.items()}
    compact = {k: v for k, v in compact.items() if k != "method"}
    compact["queries"] = q2
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) <= budget:
        return line
    prev = _prev_round_record(repo_dir)
    prev_names = set(prev[1]["queries"]) if prev else set()
    must = prev_names | set(COMMON_CORE)
    compact["queries_truncated_see"] = sidecar_name
    ordered = sorted(q2, key=lambda k: (-q2[k], k))

    def _render(names: set, ndigits: int) -> str:
        compact["queries"] = {
            k: round(per_query[k], ndigits) for k in ordered if k in names
        }
        return json.dumps(compact, separators=(",", ":"))

    sel = {k for k in q2 if k in must}
    line = _render(sel, 2)
    if len(line) > budget:
        # even the guaranteed set overflows: 1-decimal values first,
        # and only then (never expected) cut fastest non-core entries
        line = _render(sel, 1)
        while len(line) > budget and len(sel) > len(set(COMMON_CORE) & sel):
            victims = [k for k in reversed(ordered) if k in sel and k not in COMMON_CORE]
            if not victims:
                break
            sel.discard(victims[0])
            print(f"# WARNING stdout line over budget; cut {victims[0]}", file=sys.stderr)
            line = _render(sel, 1)
        return line
    # fill remaining budget slowest-first with the not-yet-included rest
    for k in ordered:
        if k in sel:
            continue
        trial = _render(sel | {k}, 2)
        if len(trial) > budget:
            continue
        sel.add(k)
        line = trial
    return line


def _prev_round_record(repo_dir: str) -> tuple[int, dict] | None:
    """Latest BENCH_r{N}.json's (N, per-query dict), or None. Used by
    the mechanized mover re-probe (VERDICT r6 #1)."""
    best = None
    for fn in os.listdir(repo_dir):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        n = int(m.group(1))
        if best is not None and n <= best[0]:
            continue
        try:
            with open(os.path.join(repo_dir, fn)) as fh:
                doc = json.load(fh)
            parsed = doc.get("parsed") if isinstance(doc.get("parsed"), dict) else doc
            if "queries" in parsed:
                best = (n, {"sf": parsed.get("sf"), "queries": dict(parsed["queries"])})
        except (OSError, ValueError):
            continue
    return best


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf",
        default=None,
        help="scale factor; maps 1 -> /root/repo/.localdata/sf1 (built by "
        "tools/make_sf.py), others -> /root/testdata/sf{SF}; sidecar becomes "
        "BENCH_SF{SF}.json. Default: $SPARK_GRAFT_SF_DIR (sf0.1 record).",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated metric names: run only these (registry "
        "queries and/or special metrics like upsert_daily_sales / "
        "skew_agg_plain). For targeted scale probes (BENCH_SF10) where "
        "the full 100-query sweep would be wasteful.",
    )
    ap.add_argument(
        "--chunk-size",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "20")),
        help="full sweeps auto-split into fresh processes of at most "
        "this many metrics (VERDICT r12 #1); 0 = single-process legacy "
        "mode. --only probes always run in-process.",
    )
    ap.add_argument(
        "--with-noise",
        action="store_true",
        help="run the 3x noise probe even under --only (the chunked "
        "orchestrator sets this on the last chunk)",
    )
    args = ap.parse_args()
    only: set[str] | None = (
        {s.strip() for s in args.only.split(",") if s.strip()} if args.only else None
    )

    def wanted(name: str) -> bool:
        return only is None or name in only
    sidecar_name = "BENCH.json"
    if args.sf is not None:
        local = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".localdata", f"sf{args.sf}"
        )
        sf_dir = local if os.path.isdir(local) else f"/root/testdata/sf{args.sf}"
        sidecar_name = f"BENCH_SF{args.sf}.json"
        if not os.path.isdir(sf_dir):
            sys.exit(
                f"bench: no data at {sf_dir}; run tools/make_sf.py --mult 10 first"
            )
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    if only is None and args.chunk_size > 0:
        # full sweep: orchestrate fresh-process chunks instead of one
        # 132-metric process (enforced chunked protocol, VERDICT r12 #1)
        repo_dir = os.path.dirname(os.path.abspath(__file__))
        _run_chunked(args, args.chunk_size, repo_dir, os.path.join(repo_dir, sidecar_name))
        return

    spark = get_spark(app_name="bench")

    # chunk children skip the Spark half of the calibration probe (12
    # JIT-warmup jobs x 2 probes x 7 chunks would be minutes of pure
    # overhead); drift folds only the python spin anyway (see
    # drift_factor) and the orchestrator takes its own spin probes.
    spin_only_cal = os.environ.get("SPARK_GRAFT_BENCH_SPIN_ONLY_CAL") == "1"
    cal_start = calibration_probe(None if spin_only_cal else spark)
    print(f"# calibration start: {cal_start} (ref {CAL_REF})", file=sys.stderr)

    registry = q.registry()
    names = [n for n in HEADLINE + [o for o in OPTIONAL if o in registry] if wanted(n)]

    # warm each query's whole-stage-codegen at the smallest SF (same
    # plan shape -> compiled-code cache hit) so the timed sf0.1 runs
    # measure data processing, not first-run JIT compilation
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            registry[name](spark, warm_dir).count()
        except Exception as exc:  # pragma: no cover - warm-up is best-effort
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    # min-of-N cache-cold samples per query: this box shares cores with
    # the round driver, and single-sample timings showed transient 3-7x
    # spikes uncorrelated with the query (a query timed 6.9s in the main
    # loop re-timed at 1.0s in the same process's noise probe). The min
    # measures the plan's cost floor; interference never makes a query
    # faster. Run count via SPARK_GRAFT_BENCH_RUNS (default 2).
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    per_query: dict[str, float] = {}
    # one fresh-cold-sample closure per recorded metric, registered as
    # each metric lands — the mover re-probe (below) re-invokes these
    reprobe_fns: dict = {}

    def _cold_reset() -> None:
        """Cache AND heap hygiene before every timed sample (untimed).
        clearCache() alone is not enough: queries that localCheckpoint
        internally (LSH verify, connected components) leave orphaned
        RDD blocks that ContextCleaner only reclaims after a JVM GC
        collects the Python-side proxies — over ~100 queries the
        accumulation inflated late-run queries 2-4x (split_neardup_safe
        read 6.4s at its slot but 3.0s interleaved early; re-probe
        extras at the very end read 10-13s)."""
        import gc

        spark.catalog.clearCache()
        gc.collect()  # drop py4j proxies so the JVM refs go weak
        spark.sparkContext._jvm.System.gc()  # let ContextCleaner drain

    def _timed_cold(fn) -> float:
        _cold_reset()
        t0 = time.time()
        fn()
        return time.time() - t0

    for name in names:
        reprobe_fns[name] = (
            lambda name=name: _timed_cold(lambda: registry[name](spark, sf_dir).count())
        )
        samples = []
        while len(samples) < runs or (
            # adaptive extra samples: if the floor hasn't converged
            # (spread >1.3x), at least one sample was interference- or
            # warmup-hit — take up to two more. Round-6 solo re-measure
            # of the two r5 "movers" showed both converge to <=1.1x of
            # r4 only after 3-4 full-scale runs (JIT on decimal-heavy
            # aggregates); 1.5x/one-extra was too loose to catch that.
            len(samples) < runs + 2
            and max(samples) > 1.3 * min(samples)
            and min(samples) > 0.2
        ):
            # queries that persist internally (s9 paged scan, dedup
            # pipeline) must not leave cached partitions to pressure
            # later queries' heap — every timed sample starts cache-cold
            # AND checkpoint-block-clean (see _cold_reset)
            _cold_reset()
            t0 = time.time()
            df = registry[name](spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
        dt = min(samples)
        per_query[name] = round(dt, 3)
        print(f"# {name}: {n} rows in {dt:.2f}s (samples: "
              f"{[round(s, 2) for s in samples]})", file=sys.stderr)

    # write path: full keyed upsert of the widest pipeline output — the
    # apples-to-apples overlay for the reference's 1,800-2,600 rows/sec
    # sink throughput (BASELINE.md)
    import shutil
    import tempfile

    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

    # warm the write path once (committer/codec init) against a throwaway
    # table: the metric is steady-state sink throughput, same basis as
    # the reference's rows/sec numbers — single-cold-sample runs showed
    # 1.5-2.5x first-write inflation (6.25s cold vs 3.95s floor at sf0.1)
    if wanted("upsert_daily_sales") or wanted("upsert_incremental_window"):
        wdir = tempfile.mkdtemp(prefix="bw_bench_warm_")
        try:
            warm = ParquetKeyedTable(wdir, ["business_key"])
            warm.upsert(
                spark, registry["pipeline_daily_sales"](spark, sf_dir).limit(1000)
            )
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    def _upsert_daily_sales_sample() -> tuple[float, int]:
        tdir = tempfile.mkdtemp(prefix="bw_bench_target_")
        try:
            target = ParquetKeyedTable(tdir, ["business_key"])
            df = registry["pipeline_daily_sales"](spark, sf_dir)
            t0 = time.time()
            target.upsert(spark, df)
            rows = target.read(spark).count()
            return time.time() - t0, rows
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

    if wanted("upsert_daily_sales"):
        dt, rows = _upsert_daily_sales_sample()
        per_query["upsert_daily_sales"] = round(dt, 3)
        reprobe_fns["upsert_daily_sales"] = lambda: _upsert_daily_sales_sample()[0]
        print(f"# upsert_daily_sales: {rows} rows in {dt:.2f}s "
              f"({rows / dt:,.0f} rows/sec)", file=sys.stderr)

    # incremental write path: the reference's nightly job merges a
    # trailing window into years of history (truenas/cron-jobs.txt:12).
    # With partition_by ⊆ key_cols the merge is partition-scoped —
    # untouched months are hard-linked forward, so commit cost is
    # O(window), not O(history). This metric times ONLY the window
    # merge against a pre-loaded table.
    from pyspark.sql import functions as F

    def _upsert_window_sample() -> tuple[float, int]:
        tdir2 = tempfile.mkdtemp(prefix="bw_bench_ptarget_")
        try:
            df = (
                registry["pipeline_daily_sales"](spark, sf_dir)
                .withColumn("part_month", F.substring("calendar_date", 1, 7))
                .persist()
            )
            ptarget = ParquetKeyedTable(
                tdir2, ["part_month", "business_key"], partition_by=["part_month"]
            )
            ptarget.upsert(spark, df)  # initial history load (untimed; materializes cache)
            window = df.where(F.col("part_month") == "1998-08")
            t0 = time.time()
            ptarget.upsert(spark, window)
            dt = time.time() - t0
            wrows = window.count()
            df.unpersist()  # keep later metrics cache-cold too
            return dt, wrows
        finally:
            shutil.rmtree(tdir2, ignore_errors=True)

    if wanted("upsert_incremental_window"):
        dt, wrows = _upsert_window_sample()
        per_query["upsert_incremental_window"] = round(dt, 3)
        reprobe_fns["upsert_incremental_window"] = lambda: _upsert_window_sample()[0]
        print(f"# upsert_incremental_window: {wrows} rows in {dt:.2f}s "
              f"({wrows / dt:,.0f} rows/sec, partition-scoped)", file=sys.stderr)

    # table-format history scaling (VERDICT r8 #7): a FIXED-size batch
    # range-scope-merged into 1x vs 10x history on an unpartitioned
    # range-clustered table. The layout's claim is commit cost
    # O(touched + batch), not O(history): wall and touched-file count
    # must stay ~flat while history grows 10x (the key-layout analogue
    # of upsert_incremental_window's flat-across-history result).
    def _range_history_sample(mult: int) -> tuple[float, int, int, int]:
        tdir = tempfile.mkdtemp(prefix="bw_bench_rh_")
        try:
            base = registry["pipeline_daily_sales"](spark, sf_dir)
            reps = spark.range(mult).select(F.col("id").alias("__rep"))
            # replica id PREFIXES the key: history growth extends the
            # key domain with new contiguous regions (the time-series
            # shape — new periods append), instead of densifying the
            # old ones
            hist = (
                base.crossJoin(F.broadcast(reps))
                .withColumn(
                    "business_key",
                    F.concat_ws("#", F.col("__rep").cast("string"), "business_key"),
                )
                .drop("__rep")
            )
            t = ParquetKeyedTable(tdir, ["business_key"])
            t.overwrite(hist)  # history load, untimed
            # fixed batch regardless of mult: a CONTIGUOUS lexicographic
            # slice of replica 0's keys (identical rows and key interval
            # at 1x and 10x history) — the range-scoped merge's
            # production shape, a key-local incremental batch
            batch = (
                base.where(F.col("business_key").between("5", "53"))
                .withColumn("business_key", F.concat_ws("#", F.lit("0"), "business_key"))
                .localCheckpoint(eager=True)
            )
            n_batch = batch.count()
            m0 = t.manifest()
            _cold_reset()
            t0 = time.time()
            t.upsert(spark, batch)
            dt = time.time() - t0
            m1 = t.manifest()
            # history files the scoped merge actually read+rewrote
            # (everything not carried forward as a hard link)
            touched = m0["n_files"] - m1["n_linked"]
            return dt, n_batch, touched, m0["n_files"]
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

    for _mult, _mname in ((1, "range_merge_hist1x"), (10, "range_merge_hist10x")):
        if wanted(_mname):
            dt, n_batch, touched, n_files = _range_history_sample(_mult)
            per_query[_mname] = round(dt, 3)
            reprobe_fns[_mname] = (
                lambda _m=_mult: _range_history_sample(_m)[0]
            )
            print(
                f"# {_mname}: {n_batch}-row fixed batch into {_mult}x history "
                f"in {dt:.2f}s; touched {touched}/{n_files} files",
                file=sys.stderr,
            )

    # incremental-rollup refresh vs base size: fixed churn (a
    # contiguous-key patch of replica 0), 1x vs 10x base. The refresh
    # reads the file-pruned change feed + the 101-group rollup, never
    # the base — the wall must track the churn, not the base size
    # (the materialized-view analogue of range_merge_hist*).
    def _matview_refresh_sample(mult: int) -> tuple[float, int, int]:
        from bw_new_data_integration_spark import catalog
        from bw_new_data_integration_spark.operators.matview import maintain_rollup

        tdir = tempfile.mkdtemp(prefix="bw_bench_mv_")
        try:
            o = catalog.load(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("k"),
                (F.col("o_custkey") % 101).cast("bigint").alias("grp"),
                F.col("o_totalprice").cast("double").alias("price"),
            )
            reps = spark.range(mult).select(F.col("id").alias("__rep"))
            # replica id shifts the key domain: base growth appends new
            # contiguous key regions (time-series shape)
            hist = (
                o.crossJoin(F.broadcast(reps))
                .withColumn("k", F.col("__rep") * F.lit(1_000_000_000) + F.col("k"))
                .drop("__rep")
            )
            t = ParquetKeyedTable(tdir + "/base", ["k"])
            t.overwrite(hist)  # untimed load
            roll = ParquetKeyedTable(tdir + "/roll", ["grp"])
            maintain_rollup(spark, t, roll, ["grp"], {"sum_price": "price"})  # untimed bootstrap
            v0 = t.current_version()
            batch = (
                o.where((F.col("k") >= 1000) & (F.col("k") < 3000))
                .withColumn("price", F.col("price") * 3)
                .localCheckpoint(eager=True)
            )
            t.upsert(spark, batch)  # untimed base commit (measured by range_merge_hist*)
            feed_files = sum(map(len, t._changed_file_sets(v0, t.current_version())))
            control_files = t.manifest(v0)["n_files"] + t.manifest()["n_files"]
            _cold_reset()
            t0 = time.time()
            maintain_rollup(spark, t, roll, ["grp"], {"sum_price": "price"})
            dt = time.time() - t0
            return dt, feed_files, control_files
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

    for _mult, _mname in ((1, "matview_refresh_1x"), (10, "matview_refresh_10x")):
        if wanted(_mname):
            dt, feed_files, n_files = _matview_refresh_sample(_mult)
            per_query[_mname] = round(dt, 3)
            reprobe_fns[_mname] = (
                lambda _m=_mult: _matview_refresh_sample(_m)[0]
            )
            print(
                f"# {_mname}: fixed-churn rollup refresh over {_mult}x base "
                f"in {dt:.2f}s; feed scanned {feed_files} files vs "
                f"{n_files} unpruned (both snapshots)",
                file=sys.stderr,
            )

    # bare approx profile: the REGISTERED profile_table_approx gate now
    # embeds an exact twin (its error-bound oracle needs it), so its
    # time no longer measures the sketch plan alone. This metric keeps
    # the production path (one scan, HLL++ state, no Expand) comparable
    # with r1/r2 rows.
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.queries import _profile_cols
    from bw_new_data_integration_spark.operators import profiling

    orders = catalog.load(spark, sf_dir, "orders")

    def _profile_bare_sample() -> float:
        return _timed_cold(
            lambda: profiling.profile(
                orders, _profile_cols(), approx=True, rsd=0.02
            ).count()
        )

    if wanted("profile_table_approx_bare"):
        per_query["profile_table_approx_bare"] = round(
            min(_profile_bare_sample() for _ in range(runs)), 3
        )
        reprobe_fns["profile_table_approx_bare"] = _profile_bare_sample
        print(f"# profile_table_approx_bare: {per_query['profile_table_approx_bare']}s",
              file=sys.stderr)

    # skew behavior (recorded per VERDICT r1 #8): one 90%-hot grouping
    # key. Plain groupBy funnels the hot key into a single reduce task;
    # salted_aggregate spreads it over salt_buckets pre-agg tasks and
    # combines — the aggregation twin of AQE's skew-join splitting.
    from bw_new_data_integration_spark import catalog
    from bw_new_data_integration_spark.operators import aggregate as agg_ops

    li = catalog.load(spark, sf_dir, "lineitem")
    skewed = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("l_orderkey") % 1000).cast("string")))
        .alias("k"),
        "l_quantity",
    )
    def _skew_plain_sample() -> float:
        return _timed_cold(
            lambda: skewed.groupBy("k")
            .agg(agg_ops.exact_sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
            .count()
        )

    def _skew_salted_sample() -> float:
        return _timed_cold(
            lambda: agg_ops.salted_aggregate(
                skewed,
                ["k"],
                {
                    "s": (F.sum(F.col("l_quantity").cast("decimal(27,6)")), "sum"),
                    "n": (F.count(F.lit(1)), "sum"),
                },
            ).count()
        )

    def _skew_advised_sample() -> float:
        # the COST-GATED advisor-driven hybrid plan (VERDICT r8 #4).
        # Per-batch sketches are INGEST-time artifacts (maintained as
        # batches land, like dedup_incremental_lsh's bucket index) —
        # their one-off build is reported as skew_sketch_build, not
        # charged to every query. The timed path is what a query
        # actually pays: advised_aggregate's input-size gate decides
        # plain-vs-advisor (sf0.1's 11 MB input falls through to plain;
        # at sf1+ the advisor engages), merges the stored sketches,
        # hot_keys advises the salted set, hot keys take the two-phase
        # aggregate, the tail the plain one.
        from bw_new_data_integration_spark.operators import sketch as sk_ops

        batched = skewed.withColumn("b", F.spark_partition_id() % 4)
        t0 = time.time()
        stored = sk_ops.topk_sketch_build(batched, "b", "k", k=32).localCheckpoint(
            eager=True
        )
        per_query.setdefault("skew_sketch_build", round(time.time() - t0, 3))

        def run():
            return agg_ops.advised_aggregate(
                skewed,
                ["k"],
                {
                    "s": (F.sum(F.col("l_quantity").cast("decimal(27,6)")), "sum"),
                    "n": (F.count(F.lit(1)), "sum"),
                },
                min_share=0.2,
                stored_sketches=stored,
            ).count()

        return _timed_cold(run)

    if wanted("skew_agg_plain"):
        per_query["skew_agg_plain"] = round(_skew_plain_sample(), 3)
        reprobe_fns["skew_agg_plain"] = _skew_plain_sample
    if wanted("skew_agg_salted"):
        per_query["skew_agg_salted"] = round(_skew_salted_sample(), 3)
        reprobe_fns["skew_agg_salted"] = _skew_salted_sample
    if wanted("skew_agg_advised"):
        per_query["skew_agg_advised"] = round(_skew_advised_sample(), 3)
        reprobe_fns["skew_agg_advised"] = _skew_advised_sample
    if wanted("skew_agg_plain") or wanted("skew_agg_salted") or wanted("skew_agg_advised"):
        print(f"# skew_agg plain={per_query.get('skew_agg_plain')}s "
              f"salted={per_query.get('skew_agg_salted')}s "
              f"advised={per_query.get('skew_agg_advised')}s", file=sys.stderr)

    # XMLA backfill: 39 fiscal-period slices (the reference's
    # backfill_sales_channel_by_period.sh scenario) with a simulated
    # 20 ms SOAP round-trip per slice. Compares the driver-loop fetch
    # (fetch_partitioned, reference parity) against the executor-side
    # mapInPandas fetch (fetch_partitioned_distributed). Excluded from
    # the wall total: the sleeps measure fetch *parallelism*, not
    # engine throughput.
    from bw_new_data_integration_spark.sources import xmla as xmla_src

    if wanted("xmla_backfill39_seq_baseline") or wanted("xmla_backfill39_dist"):
        o = catalog.load(spark, sf_dir, "orders")
        prows = (
            o.groupBy(
                F.date_format("o_orderdate", "yyyy-MM").alias("period"), "o_orderpriority"
            )
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .collect()
        )
        by_period: dict[str, list] = {}
        for r in prows:
            by_period.setdefault(r["period"], []).append(r)
        periods = sorted(by_period)[:39]

        def make_execute():
            def execute(mdx: str) -> str:
                time.sleep(0.02)  # simulated SOAP RTT
                p = re.search(r"\[P([0-9-]+)\]", mdx).group(1)
                rws = by_period[p]
                return xmla_src.render_mddataset(
                    ["n_orders"],
                    [[("[Order].[Priority]", r["o_orderpriority"])] for r in rws],
                    [[repr(r["n_orders"])] for r in rws],
                )

            return execute

        maps = [{"pattern": "Priority", "field": "priority"}]
        mdx = {p: f"SELECT ... FROM [Cube] WHERE [Time].[P{p}]" for p in periods}

        def _xmla_seq_sample() -> float:
            return _timed_cold(
                lambda: xmla_src.fetch_partitioned(spark, make_execute(), mdx, maps).count()
            )

        def _xmla_dist_sample() -> float:
            return _timed_cold(
                lambda: xmla_src.fetch_partitioned_distributed(
                    spark, make_execute, mdx, maps, ["priority"], ["n_orders"]
                ).count()
            )

        if wanted("xmla_backfill39_seq_baseline"):
            per_query["xmla_backfill39_seq_baseline"] = round(_xmla_seq_sample(), 3)
            reprobe_fns["xmla_backfill39_seq_baseline"] = _xmla_seq_sample
        if wanted("xmla_backfill39_dist"):
            per_query["xmla_backfill39_dist"] = round(_xmla_dist_sample(), 3)
            reprobe_fns["xmla_backfill39_dist"] = _xmla_dist_sample
        print(
            f"# xmla_backfill 39 slices @20ms RTT: seq="
            f"{per_query.get('xmla_backfill39_seq_baseline')}s dist="
            f"{per_query.get('xmla_backfill39_dist')}s",
            file=sys.stderr,
        )

    # noise floor: re-time one cheap and one mid-weight query 3x so the
    # recorded numbers carry their own run-to-run variance estimate
    noise: dict[str, list[float]] = {}
    if only is None or args.with_noise:
        for name in ("a1_pricing_summary", "pipeline_daily_sales"):
            samples = []
            for _ in range(3):
                _cold_reset()
                t0 = time.time()
                registry[name](spark, sf_dir).count()
                samples.append(round(time.time() - t0, 3))
            noise[name] = samples
        print(f"# noise_probe: {noise}", file=sys.stderr)

    # Mechanized mover re-probe (VERDICT r6 #1): two rounds running,
    # >1.3x cross-round movers needed manual solo adjudication after the
    # record shipped. Diff against the previous round's record and take
    # 3 extra cold samples for any common metric that reads >1.3x its
    # previous floor; the solo floor (min over first pass + extras)
    # replaces the recorded value, and the full evidence lands in
    # `mover_reprobe` so drift adjudication is in-record, not manual.
    mover_reprobe: dict[str, dict] = {}
    prev = _prev_round_record(os.path.dirname(os.path.abspath(__file__)))
    if prev is not None and prev[1].get("sf") == sf:
        prev_q = prev[1]["queries"]
        for name in sorted(per_query):
            p = prev_q.get(name)
            cur = per_query[name]
            if (
                p is None
                or p < 0.15  # sub-150ms floors are noise-dominated
                or cur <= 1.3 * p
                or name not in reprobe_fns
            ):
                continue
            extras = [round(reprobe_fns[name](), 3) for _ in range(3)]
            floor = round(min([cur] + extras), 3)
            mover_reprobe[name] = {
                "prev_round": prev[0],
                "prev": p,
                "first_pass": cur,
                "extra_samples": extras,
                "floor": floor,
                "ratio_vs_prev": round(floor / p, 2),
            }
            per_query[name] = floor
            print(
                f"# mover_reprobe {name}: prev={p}s first={cur}s "
                f"extras={extras} -> floor={floor}s "
                f"({floor / p:.2f}x prev)",
                file=sys.stderr,
            )
        if mover_reprobe:
            print(
                f"# mover_reprobe: {len(mover_reprobe)} metrics re-floored "
                f"vs BENCH_r{prev[0]:02d}", file=sys.stderr,
            )

    # end-of-run calibration: mid-run host degradation (the r10 failure
    # mode) shows up as end > start; drift averages the two
    cal_end = calibration_probe(None if spin_only_cal else spark)
    drift = drift_factor([cal_start, cal_end])
    calibration = {
        "start": cal_start,
        "end": cal_end,
        "ref": CAL_REF,
        "drift_factor": drift,
    }
    print(f"# calibration end: {cal_end} -> drift_factor={drift}", file=sys.stderr)

    # wall totals are derived AFTER the re-probe so solo floors count
    total = sum(v for k, v in per_query.items() if not _excluded_from_wall(k))
    core_present = [n for n in COMMON_CORE if n in per_query]
    common_core_wall = round(sum(per_query[n] for n in core_present), 3)
    if len(core_present) < len(COMMON_CORE):
        missing = sorted(set(COMMON_CORE) - set(core_present))
        print(f"# WARNING common-core entries missing: {missing}", file=sys.stderr)

    # Full record goes to a sidecar file; stdout carries a compact JSON
    # line sized to survive the driver's 2000-char stdout-tail capture
    # (BENCH_r03.json lost its head because the line + long method note
    # overflowed the window — VERDICT r3 "What's wrong" #2).
    excluded = sorted(k for k in per_query if _excluded_from_wall(k))
    full = {
        "metric": "headline_queries_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "excluded_from_wall": excluded,
        "partial_only": sorted(only) if only else None,
        "common_core_wall": common_core_wall,
        "common_core_n": len(core_present),
        # same-set wall over whatever core members exist in THIS record
        # (VERDICT r8 #6): on a full sweep it equals the strict number;
        # after a partial --only merge it is recomputed over the merged
        # queries below, so scale sidecars built from chunked probes
        # still self-report a cross-record comparable core wall.
        "common_core_sameset_wall": common_core_wall,
        "common_core_sameset_n": len(core_present),
        "common_core": COMMON_CORE,
        "mover_reprobe": mover_reprobe,
        "sf": sf,
        "noise_probe_3x": noise,
        # drift-normalized twins (VERDICT r10 #1): raw / drift_factor ≈
        # what this run would have read on the CAL_REF-speed box. The
        # normalized common-core wall is the cross-round comparison
        # number from r11 on; raw stays the ground truth.
        "calibration": calibration,
        "value_normalized": round(total / drift, 3),
        "common_core_wall_normalized": round(common_core_wall / drift, 3),
        "method": {
            "discipline": f"cache-cold-per-query, min-of-{runs}",
            "detail": (
                "codegen warmed once at sf0.001 per query; "
                "clearCache + pyGC + JVM System.gc before each timed "
                "sample (orphaned localCheckpoint blocks otherwise "
                "accumulate over ~100 queries and inflate late-run "
                "queries 2-4x -- found by the round-7 mover re-probe); "
                f"per-query time = MIN of {runs} cold samples (the box "
                "shares cores with the round driver; min measures the "
                "plan's cost floor). Single process, queries sequential. "
                "NOTE on comparability: min-of-N reads <= single-sample "
                "under noise, so r2 (single-sample) -> r3+ (min-of-2) "
                "totals are not strictly comparable; per-query deltas "
                "confirmed by solo reruns. BENCH_r01 was warm-cache and "
                "reads faster than like-for-like. Round-5 solo 3-sample "
                "rerun attributed the uniform r3->r4 drift to round-driver "
                "interference (common-query sum 0.78x of r4's in-round "
                "record). upsert metrics warm the write path once "
                "(untimed 1k-row upsert) before timing: steady-state "
                "sink throughput, same basis as the reference numbers. "
                "Round 6 on: headline wall EXCLUDES labeled comparison "
                "twins (*_baseline, xmla_backfill39 RTT-simulation pair) "
                "-- they are timed and listed in excluded_from_wall but "
                "a deliberately weaker or sleep-bound plan must not "
                "inflate the production-shape total. Round 7 on: any "
                "metric reading >1.3x its previous-round record gets 3 "
                "extra cold samples in-run (mover_reprobe); the floor "
                "replaces the first-pass value, so shared-box drift is "
                "adjudicated inside the record. common_core_wall sums "
                "the FROZEN 31-query COMMON_CORE list -- the only "
                "number meant for round-over-round comparison."
            ),
            "n_queries": len(per_query),
            "n_in_wall": len(per_query) - len(excluded),
        },
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), sidecar_name)
    if only and os.path.exists(sidecar):
        # targeted probe (--only): MERGE into the existing record —
        # a partial run must never clobber the full sweep's sidecar
        # (r8: three upsert-only probes silently reduced BENCH_SF1.json
        # from 102 metrics to 1). Per-query values and exclusions are
        # upserted; untouched entries and the fuller run's wall totals
        # are kept; merged partial_only accumulates what was re-probed.
        try:
            with open(sidecar) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = None
        if prev and isinstance(prev.get("queries"), dict):
            full = merge_partial_record(
                prev, per_query, excluded, set(only), mover_reprobe, calibration,
                noise=noise or None,
            )
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1)
    print(f"# full record written to {sidecar}", file=sys.stderr)

    compact = {
        "metric": "headline_queries_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "common_core_wall": common_core_wall,
        "common_core_n": len(core_present),
        "common_core_wall_normalized": round(common_core_wall / drift, 3),
        "drift_factor": drift,
        "mover_reprobe_n": len(mover_reprobe),
        "sf": sf,
        "method": (
            f"cache-cold min-of-{runs}; wall excludes {len(excluded)} "
            f"*_baseline twins; common_core_wall = frozen {len(COMMON_CORE)}-query "
            f"cross-round basis; >1.3x movers vs prev round re-floored with 3 "
            f"extra samples; drift_factor = host speed vs pinned CAL_REF "
            f"(normalized = raw/drift); full record in {sidecar_name}"
        ),
    }
    line = render_stdout_line(
        compact, per_query, sidecar_name, os.path.dirname(os.path.abspath(__file__))
    )
    print(f"# stdout JSON line length: {len(line)}", file=sys.stderr)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

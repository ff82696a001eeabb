"""CLI runner — the engine's ``olap_to_dataverse.py`` equivalent.

Mirrors the reference's entry-point surface (``modules/olap_sync.py``):
pipeline choices discovered dynamically from config, slicer flags
(``--fy``, ``--fp``, ``--length 1wk|2wk``), ``--query all``,
``--dry-run``, and a ``--print-plan`` debug flag (the reference's
``--print-mdx``, except here the "plan" is Catalyst's, via
``explain``). Sink is a keyed parquet target per mapping table name.

Usage:
    python -m bw_new_data_integration_spark.runner \
        --query daily_sales --fy 1997 --sf-dir /root/testdata/sf0.01 \
        --target-root /tmp/targets
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import functions as F

from bw_new_data_integration_spark import catalog
from bw_new_data_integration_spark.plans import pipeline as plans
from bw_new_data_integration_spark.plans import slicers
from bw_new_data_integration_spark.session import get_spark
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

DEFAULT_PIPELINES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "pipelines", "pipelines.yaml")


def build_slicer(spec: plans.PipelineSpec, args) -> object | None:
    col = spec.slicer_column
    if col is None:
        return None
    # fiscal anchor: CLI flag overrides the pipeline spec's fy_start
    fy_m, fy_d = (
        plans.parse_fy_start(args.fy_start) if getattr(args, "fy_start", None) else spec.fy_start
    )
    if args.fy and args.fp:
        return slicers.fiscal_period(col, args.fy, args.fp, fy_m, fy_d)
    if args.fy:
        return slicers.fiscal_year(col, args.fy, fy_m, fy_d)
    if args.length:
        days = 7 if args.length == "1wk" else 14
        return slicers.trailing_days(col, days)
    return None


def fetch_cube_source(spark, spec: plans.PipelineSpec, args):
    """--from-cube: fetch the pipeline's source from a REAL XMLA/SOAP
    endpoint instead of the parquet fixture — the reference's actual
    topology (cube does the aggregation; this engine maps/keys/sinks).

    Slices: one per fiscal period of --fy (or of each --backfill-years
    year), the reference's period-at-a-time discipline; plain --fy
    fetches the 13 periods of that year in one partitioned read.
    Credentials: --xmla-user + the env var named by --xmla-password-env
    (never a plaintext CLI password). The fetched frame's dims come
    from ``source.hierarchies`` and its measures from
    ``source.cube_measures`` in pipelines.yaml.
    """
    from bw_new_data_integration_spark.plans import slicers
    from bw_new_data_integration_spark.sources import xmla
    from bw_new_data_integration_spark.sources.http_transport import make_xmla_executor

    if not spec.mdx:
        raise SystemExit(f"pipeline {spec.name!r} has no source.mdx — cannot --from-cube")
    if not spec.hierarchies:
        raise SystemExit(f"pipeline {spec.name!r} has no source.hierarchies")
    password = os.environ.get(args.xmla_password_env or "", "")
    if not password:
        raise SystemExit(
            f"--xmla-password-env {args.xmla_password_env!r} is unset or empty"
        )
    years = args.backfill_years or [args.fy]
    if not years[0]:
        raise SystemExit("--from-cube needs --fy or --backfill-years")
    fy_m, fy_d = spec.fy_start
    mdx_by_slice = spec.backfill_mdx(
        {
            f"{fy}-P{p:02d}": slicers.mdx_member_13_4(fy, p)
            for fy in years
            for p in range(1, 14)
            if args.fp is None or p == args.fp
        }
    )
    server, user = args.xmla_server, args.xmla_user
    cat, verify, timeout = spec.catalog or "", not args.xmla_insecure, args.xmla_timeout

    def execute_factory():
        return make_xmla_executor(
            server, cat, user, password, ssl_verify=verify, timeout=timeout
        )

    dim_fields = [h["field"] for h in spec.hierarchies]
    # fetch under the response's measure CAPTIONS, then rename to the
    # engine field names the mapping addresses
    df = xmla.fetch_partitioned_distributed(
        spark,
        execute_factory,
        mdx_by_slice,
        [dict(h) for h in spec.hierarchies],
        dim_fields=dim_fields,
        measure_fields=[caption for caption, _f in spec.cube_measures],
    ).withColumnRenamed("__slice", "slice_id")  # mapping-addressable
    for caption, fld in spec.cube_measures:
        df = df.withColumnRenamed(caption, fld)
    return df


def probe_connectivity(specs, name, args) -> dict:
    """--probe: three-step pre-flight connectivity check, no Spark job —
    the ops tool the reference ships as ``Testing Scripts/
    test_step2_validation.py:32-120`` / ``test_olap_access.py:24-60``
    (token fetch → one-measure MDX → tiny keyed upsert), re-expressed
    over this engine's transports.

    1. **token** — OAuth2 client-credentials fetch against
       ``--odata-token-url`` (make_oauth_token_fetch) when configured,
       else the static bearer from ``--odata-token-env``; reported as a
       length, never echoed.
    2. **cube** — ``make_xmla_executor`` runs ``SELECT {<first cube
       measure>} ON COLUMNS FROM [<cube>]`` (the reference's 1-measure
       smoke MDX) and the response must parse to ≥1 cell.
    3. **sink** — one-record ``$batch`` upsert through
       ``ODataBatchTransport``, alternate key ``CONNECTIVITY-PROBE``
       (the reference's item-6 test upsert); per-row status must be
       2xx. Idempotent: re-probing overwrites the same probe row.

    Any step failing raises SystemExit (non-zero), with the step named —
    a probe that half-passes silently is how the reference's nightly
    jobs used to discover auth rot at 2am.
    """
    import re

    from bw_new_data_integration_spark.sources.credentials import TokenProvider
    from bw_new_data_integration_spark.sources.http_transport import (
        HttpClient,
        ODataBatchTransport,
        make_oauth_token_fetch,
        make_xmla_executor,
    )
    from bw_new_data_integration_spark.sources.xmla import (
        parse_axes_and_cells as xmla_parse,
    )

    spec = specs[name]
    out: dict = {"pipeline": name, "probe": True}

    # -- step 1: sink token --------------------------------------------------
    t0 = time.time()
    if getattr(args, "odata_token_url", None):
        secret = os.environ.get(args.odata_client_secret_env or "", "")
        if not secret:
            raise SystemExit(
                f"probe token: --odata-client-secret-env "
                f"{args.odata_client_secret_env!r} is unset or empty"
            )
        scope = args.odata_scope or args.to_odata_url.rstrip("/") + "/.default"
        fetch = make_oauth_token_fetch(
            args.odata_token_url,
            args.odata_client_id or "",
            secret,
            scope,
            ssl_verify=not args.xmla_insecure,
        )
        token_source = "oauth"
    else:
        static = os.environ.get(args.odata_token_env or "", "")
        if not static:
            raise SystemExit(
                f"probe token: --odata-token-env {args.odata_token_env!r} "
                "is unset or empty (or pass --odata-token-url for a live fetch)"
            )
        fetch = lambda: static  # noqa: E731 - trivial closure
        token_source = "env"
    tokens = TokenProvider(fetch=fetch)
    try:
        token = tokens.token()
    except Exception as exc:
        raise SystemExit(f"probe token: FAILED — {exc}") from exc
    out["token"] = {
        "ok": True,
        "source": token_source,
        "token_len": len(token),
        "seconds": round(time.time() - t0, 3),
    }

    # -- step 2: one-measure MDX against the cube ----------------------------
    if not spec.cube_measures:
        raise SystemExit(f"probe cube: pipeline {name!r} has no source.cube_measures")
    password = os.environ.get(args.xmla_password_env or "", "")
    if not password:
        raise SystemExit(
            f"probe cube: --xmla-password-env {args.xmla_password_env!r} is unset"
        )
    caption = spec.cube_measures[0][0]
    cube_m = re.search(r"FROM\s*\[([^\]]+)\]", spec.mdx or "", re.IGNORECASE)
    cube = cube_m.group(1) if cube_m else (spec.catalog or "")
    mdx = f"SELECT {{ {caption} }} ON COLUMNS FROM [{cube}]"
    t0 = time.time()
    try:
        execute = make_xmla_executor(
            args.xmla_server,
            spec.catalog or "",
            args.xmla_user,
            password,
            ssl_verify=not args.xmla_insecure,
            timeout=args.xmla_timeout,
        )
        measures, _rows, cells = xmla_parse(execute(mdx))
    except Exception as exc:
        raise SystemExit(f"probe cube: FAILED — {exc}") from exc
    if not cells:
        raise SystemExit(
            f"probe cube: query returned no cells (measures parsed: {measures})"
        )
    out["cube"] = {
        "ok": True,
        "measure": caption,
        "n_cells": len(cells),
        "value": cells.get(0),
        "seconds": round(time.time() - t0, 3),
    }

    # -- step 3: single-row $batch upsert ------------------------------------
    key = spec.mapping.alternate_key
    t0 = time.time()
    try:
        transport = ODataBatchTransport(
            HttpClient(args.to_odata_url, timeout=60.0, ssl_verify=not args.xmla_insecure),
            spec.mapping.table,
            tokens,
            key,
        )
        statuses = transport([{key: "CONNECTIVITY-PROBE"}])
    except Exception as exc:
        raise SystemExit(f"probe sink: FAILED — {exc}") from exc
    if not statuses or not 200 <= statuses[0] < 300:
        raise SystemExit(f"probe sink: upsert returned HTTP {statuses}")
    out["sink"] = {
        "ok": True,
        "table": spec.mapping.table,
        "status": statuses[0],
        "seconds": round(time.time() - t0, 3),
    }
    return out


def maintain_one(spark, specs, name, args) -> dict:
    """Target-table maintenance for one pipeline: compact (optionally
    Z-ordered) or vacuum. Fails loud on a target that has never been
    loaded — maintaining nothing is a scheduling mistake, not a no-op."""
    spec = specs[name]
    target = ParquetKeyedTable(
        os.path.join(args.target_root, spec.mapping.table), [spec.mapping.alternate_key]
    )
    if not target.exists():
        raise SystemExit(
            f"{name}: no table at {target.path} — load it before maintaining"
        )
    t0 = time.time()
    if args.maintain == "compact":
        zorder_by = tuple(args.zorder_by.split(",")) if args.zorder_by else None
        version = target.compact(spark, zorder_by=zorder_by)
        m = target.manifest(version) or {}
        return {
            "pipeline": name,
            "maintain": "compact",
            "version": version,
            "n_files": m.get("n_files"),
            "zorder_by": list(zorder_by) if zorder_by else None,
            "seconds": round(time.time() - t0, 2),
        }
    if args.maintain == "analyze":
        if not args.stats_cols:
            raise SystemExit("--maintain analyze requires --stats-cols col[,col...]")
        report = target.analyze(cols=args.stats_cols.split(","))
        return {
            "pipeline": name,
            "maintain": "analyze",
            **report,
            "seconds": round(time.time() - t0, 2),
        }
    removed = target.vacuum(keep_last=args.vacuum_keep)
    return {
        "pipeline": name,
        "maintain": "vacuum",
        "removed_versions": removed,
        "kept": args.vacuum_keep,
        "seconds": round(time.time() - t0, 2),
    }


def run_one(spark, specs, name, args) -> dict:
    import dataclasses

    from pyspark.sql import Observation

    if getattr(args, "maintain", None):
        return maintain_one(spark, specs, name, args)

    spec = specs[name]
    if getattr(args, "from_cube", False):
        src = fetch_cube_source(spark, spec, args)
        # the cube already aggregated to the pipeline grain (reference
        # lifecycle): apply only the mapping stages — no re-aggregate,
        # no slicer (the slice is baked into each rendered MDX)
        df = plans.build_plan(
            src, dataclasses.replace(spec, aggregate=None), audit_ts=True
        )
    elif getattr(args, "from_delta", None):
        # the pipeline's source table is an EXTERNAL Delta table
        # (written by a real Delta writer, read via log replay); the
        # normal slicer/aggregate plan applies unchanged on top
        from bw_new_data_integration_spark.sources.delta_import import read_delta

        path, _, v = args.from_delta.partition("@")
        src = read_delta(spark, path, version=int(v) if v else None)
        df = plans.build_plan(src, spec, slicer=build_slicer(spec, args), audit_ts=True)
    else:
        src = catalog.load(spark, args.sf_dir, spec.source_table)
        df = plans.build_plan(src, spec, slicer=build_slicer(spec, args), audit_ts=True)
    # run-summary metrics ride the job that materializes the pipeline
    # (Spark's observe() — no second pass over the data): output rows
    # plus an audit that the F1/F7 key filters actually held. At 100 TB
    # a separate validation count would rescan the source; this is free.
    # NOT attached on the REST-sink path: write_batched materializes
    # via foreachPartition (the RDD surface), which never fires
    # CollectMetrics — obs.get would block forever; that path's
    # per-row accounting comes from the sink accumulators instead.
    key = spec.mapping.alternate_key
    if not getattr(args, "to_odata_url", None):
        obs = Observation(f"pipeline_metrics_{name}")
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(
                F.when(F.col(key).isNull() | (F.length(key) == 0), 1).otherwise(0)
            ).alias("empty_keys"),
        )
    if args.print_plan:
        df.explain("formatted")
    if args.dry_run:
        n = df.count()
        return {"pipeline": name, "dry_run": True, "rows": n, "metrics": obs.get}
    if getattr(args, "to_odata_url", None):
        # the reference's actual sink: batched keyed REST upsert over
        # the real $batch wire (sources/http_transport), full retry /
        # Retry-After / token-refresh discipline from write_batched
        from bw_new_data_integration_spark.sources import odata

        url, table = args.to_odata_url, spec.mapping.table
        key = spec.mapping.alternate_key
        # token resolved ON THE DRIVER (executor Python workers freeze
        # their env at daemon spawn, so an env read there is unreliable)
        # and carried in the task closure — the reference does the same
        # (token passed into the upsert call). Deployments needing
        # executor-side acquisition/refresh wire their own
        # transport_factory through the odata.write_batched library API.
        token = os.environ.get(args.odata_token_env or "", "")
        if not token:
            raise SystemExit(
                f"--odata-token-env {args.odata_token_env!r} is unset or empty"
            )

        def transport_factory():  # executor-side: the socket lives next to use
            from bw_new_data_integration_spark.sources.credentials import TokenProvider
            from bw_new_data_integration_spark.sources.http_transport import (
                HttpClient,
                ODataBatchTransport,
            )

            return ODataBatchTransport(
                HttpClient(url, timeout=600.0),
                table,
                TokenProvider(fetch=lambda: token),
                key,
            )

        t0 = time.time()
        stats = odata.write_batched(df, transport_factory, key)
        return {
            "pipeline": name,
            "sink": "odata",
            **stats,
            "seconds": round(time.time() - t0, 2),
        }
    target = ParquetKeyedTable(
        os.path.join(args.target_root, spec.mapping.table), [spec.mapping.alternate_key]
    )
    t0 = time.time()
    version = target.upsert(spark, df)
    n = target.read(spark).count()
    return {
        "pipeline": name,
        "rows": n,
        "version": version,
        "seconds": round(time.time() - t0, 2),
        "metrics": obs.get,
    }


def main(argv=None) -> int:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--pipelines", default=DEFAULT_PIPELINES)
    known, _ = pre.parse_known_args(argv)
    specs = plans.load_pipelines(known.pipelines)

    ap = argparse.ArgumentParser(description=__doc__, parents=[pre])
    # choices discovered from config, like modules/olap_sync.py:199-209
    ap.add_argument("--query", required=True, choices=[*specs.keys(), "all"])
    ap.add_argument("--fy", type=int, help="fiscal-year slicer (F4)")
    ap.add_argument("--fp", type=int, help="fiscal-period slicer, 1-13 (F5)")
    ap.add_argument(
        "--fy-start",
        help="fiscal-year anchor MM-DD (13-4 calendar start; default from pipeline spec, else 01-01)",
    )
    ap.add_argument("--length", choices=["1wk", "2wk"], help="trailing-window slicer (F6)")
    ap.add_argument(
        "--backfill-years",
        type=int,
        nargs="+",
        help="multi-year backfill: run the pipeline once per 13-4 fiscal "
        "period of each listed year (the reference's period-at-a-time "
        "discipline — one bounded slice per run, idempotent upserts into "
        "the same target; backfill_sales_channel_by_period.sh)",
    )
    ap.add_argument("--sf-dir", default=catalog.DEFAULT_SF_DIR)
    ap.add_argument("--target-root", default="/tmp/bw_targets")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--print-plan", action="store_true")
    # real cube source (sources/http_transport.make_xmla_executor):
    # credentials via env var, never a plaintext CLI flag
    ap.add_argument(
        "--from-cube",
        action="store_true",
        help="fetch the source from the XMLA endpoint (source.mdx + "
        "source.hierarchies in pipelines.yaml) instead of the parquet "
        "fixture — the reference's production topology",
    )
    ap.add_argument(
        "--from-delta",
        metavar="PATH[@VERSION]",
        help="read the pipeline's source from an external Delta table "
        "(transaction-log replay via sources/delta_import) instead of "
        "the parquet fixture; @VERSION time-travels",
    )
    ap.add_argument("--xmla-server", help="cube server base URL (https://host[/xmla/default])")
    ap.add_argument("--xmla-user")
    ap.add_argument(
        "--xmla-password-env",
        help="name of the environment variable holding the cube password",
    )
    ap.add_argument("--xmla-insecure", action="store_true", help="disable TLS verification")
    ap.add_argument("--xmla-timeout", type=float, default=300.0)
    ap.add_argument(
        "--to-odata-url",
        help="sink to a keyed REST API via $batch upserts instead of the "
        "parquet target (the reference's Dataverse-shaped sink); base URL "
        "of the service root",
    )
    ap.add_argument(
        "--odata-token-env",
        help="name of the environment variable holding the sink bearer token",
    )
    # pre-flight connectivity probe (reference Testing Scripts/
    # test_step2_validation.py): token fetch -> 1-measure MDX -> 1-row
    # $batch upsert; runs INSTEAD of a load, starts no Spark session
    ap.add_argument(
        "--probe",
        action="store_true",
        help="three-step connectivity check (token, cube MDX, sink upsert) "
        "for the selected pipeline's endpoints; no data is loaded",
    )
    ap.add_argument(
        "--odata-token-url",
        help="OAuth2 token endpoint for a live client-credentials fetch "
        "(with --probe); omit to use the static --odata-token-env bearer",
    )
    ap.add_argument("--odata-client-id")
    ap.add_argument(
        "--odata-client-secret-env",
        help="name of the environment variable holding the OAuth client secret",
    )
    ap.add_argument(
        "--odata-scope",
        help="OAuth scope (default: <to-odata-url>/.default)",
    )
    # table maintenance (the scheduled OPTIMIZE/VACUUM jobs a parquet
    # target needs; runs INSTEAD of a load for the selected pipelines)
    ap.add_argument(
        "--maintain",
        choices=["compact", "vacuum", "analyze"],
        help="run target-table maintenance instead of a load",
    )
    ap.add_argument(
        "--stats-cols",
        help="with --maintain analyze: comma-separated columns whose "
        "per-file min/max footer stats to backfill into the current "
        "manifest (enables read_where data skipping on existing tables)",
    )
    ap.add_argument(
        "--zorder-by",
        help="with --maintain compact: two comma-separated columns to "
        "Z-ORDER the rewrite by (multi-column pruning layout)",
    )
    ap.add_argument(
        "--vacuum-keep",
        type=int,
        default=2,
        help="with --maintain vacuum: snapshot versions to retain",
    )
    args = ap.parse_args(argv)
    if args.from_cube and not (args.xmla_server and args.xmla_user and args.xmla_password_env):
        ap.error("--from-cube requires --xmla-server, --xmla-user, --xmla-password-env")
    if args.to_odata_url and not args.odata_token_env and not (
        args.probe and args.odata_token_url
    ):
        ap.error("--to-odata-url requires --odata-token-env")
    if args.backfill_years and (args.fy or args.fp or args.length):
        ap.error(
            "--backfill-years drives --fy/--fp itself and ignores --length; "
            "combining them is ambiguous — drop the conflicting flags"
        )
    if args.probe:
        if not (args.xmla_server and args.xmla_user and args.xmla_password_env):
            ap.error("--probe requires --xmla-server, --xmla-user, --xmla-password-env")
        if not args.to_odata_url:
            ap.error("--probe requires --to-odata-url")
        if args.odata_token_url and not (
            args.odata_client_id and args.odata_client_secret_env
        ):
            ap.error(
                "--odata-token-url requires --odata-client-id and "
                "--odata-client-secret-env"
            )
        if not (args.odata_token_url or args.odata_token_env):
            ap.error("--probe requires --odata-token-url or --odata-token-env")
        if args.query == "all":
            ap.error("--probe checks one pipeline's endpoints; pick one")
        # no Spark session: the probe is a pre-flight ops tool and must
        # stay fast/cheap enough to run from a cron minute-gate
        result = probe_connectivity(specs, args.query, args)
        print(result)
        return 0

    spark = get_spark(app_name="pipeline_runner")
    names = list(specs) if args.query == "all" else [args.query]
    if args.query == "all":
        # cube-only pipelines (hierarchies, no aggregate) need
        # --from-cube; fixture pipelines have no MDX to fetch — keep
        # `all` meaning "all runnable in this mode"
        if args.from_cube:
            names = [n for n in names if specs[n].mdx]
        else:
            names = [n for n in names if not (specs[n].hierarchies and specs[n].aggregate is None)]
    for name in names:
        if args.from_cube and args.backfill_years:
            # one PARTITIONED fetch covers every (year, period) slice —
            # the whole point of the executor-side cube read; the
            # per-period driver loop below is the parquet-fixture path
            result = run_one(spark, specs, name, args)
            print({"backfill_years": args.backfill_years, **result})
        elif args.backfill_years:
            for fy in args.backfill_years:
                for fp in range(1, 14):
                    args.fy, args.fp = fy, fp
                    result = run_one(spark, specs, name, args)
                    print({"fy": fy, "fp": fp, **result})
        else:
            result = run_one(spark, specs, name, args)
            print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())

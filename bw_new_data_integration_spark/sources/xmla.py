"""XMLA/MDX cube source: fetch + flatten a multidimensional response.

Re-implements, Spark-first, what the reference's parsers do
(``modules/olap.py:48-160``, generalized in
``modules/generic_xmla_parser.py:20-170``): an XMLA ``Execute``
response is a 2-axis dataset — Axis0 (COLUMNS) carries the measure
members, Axis1 (ROWS) carries dimension tuples from a CrossJoin, and
sparse ``CellData`` is addressed by
``CellOrdinal = row_idx * num_measures + col_idx``
(the universal invariant, ``modules/generic_xmla_parser.py:6-12``).

Split of labor at scale:

- the SOAP fetch is inherently driver-side (one HTTP response per
  slicer); partition the *query set* (one task per fiscal-year /
  period slice) the way a JDBC ``partitionColumn`` read partitions a
  table — see ``fetch_partitioned``;
- the flatten is expressed ON the cluster: raw (ordinal, value) cells
  become rows via the COO pivot ``r = ordinal div n_measures``,
  ``c = ordinal % n_measures`` + ``groupBy(r).pivot(measure)`` —
  no per-row Python.

Hierarchy→column naming is config-driven regex mapping, matching the
reference's ``hierarchy_mappings`` (``pipelines/pipelines.yaml:13-17``).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NS = {
    "m": "urn:schemas-microsoft-com:xml-analysis:mddataset",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_axes_and_cells(
    xml_text: str,
) -> tuple[list[str], list[dict[str, str]], dict[int, str]]:
    """Parse an XMLA mddataset response into
    (measure_names, row_tuples, cells_by_ordinal).

    Namespace-tolerant: walks by local tag name, so SSAS namespace
    variants all parse.
    """
    root = ET.fromstring(xml_text)
    axes: dict[str, list[list[tuple[str, str]]]] = {}
    cells: dict[int, str] = {}

    for elem in root.iter():
        tag = _local(elem.tag)
        if tag == "Axis":
            name = elem.get("name", "")
            tuples: list[list[tuple[str, str]]] = []
            for tup in elem.iter():
                if _local(tup.tag) == "Tuple":
                    members = []
                    for mem in tup:
                        if _local(mem.tag) != "Member":
                            continue
                        hierarchy = mem.get("Hierarchy", "")
                        caption = ""
                        for child in mem:
                            if _local(child.tag) == "Caption":
                                caption = child.text or ""
                    # SSAS uses <Caption>; some servers emit <MEMBER_CAPTION>
                            elif _local(child.tag) == "MEMBER_CAPTION":
                                caption = child.text or ""
                        members.append((hierarchy, caption))
                    tuples.append(members)
            axes[name] = tuples
        elif tag == "Cell":
            ordinal = int(elem.get("CellOrdinal", "-1"))
            value = None
            for child in elem:
                if _local(child.tag) == "Value":
                    value = child.text
            if ordinal >= 0:
                cells[ordinal] = value

    measures = [
        caption for tup in axes.get("Axis0", []) for (_h, caption) in tup
    ]
    rows = [dict(tup) for tup in axes.get("Axis1", [])]
    return measures, rows, cells


class HierarchyMapper:
    """regex pattern -> output field name, first match wins
    (reference ``modules/generic_xmla_parser.py:49-62``)."""

    def __init__(self, mappings: Iterable[dict[str, str]]):
        self._compiled = [(re.compile(m["pattern"]), m["field"]) for m in mappings]

    def field_for(self, hierarchy: str) -> str | None:
        for rx, field in self._compiled:
            if rx.search(hierarchy):
                return field
        return None


def response_to_df(
    spark: SparkSession,
    xml_text: str,
    hierarchy_mappings: Iterable[dict[str, str]],
) -> DataFrame:
    """Flatten one XMLA response to a DataFrame on the cluster.

    Driver parses XML structure only (axis labels are KBs); the sparse
    cell pivot — the O(rows × measures) part — runs as a Spark plan:
    parallelize (ordinal, value) → derive (row_idx, measure) via the
    ordinal invariant → groupBy(row_idx).pivot(measure) → join row
    dimension tuples.
    """
    measures, rows, cells = parse_axes_and_cells(xml_text)
    mapper = HierarchyMapper(hierarchy_mappings)
    n_measures = max(len(measures), 1)

    dim_fields: list[str] = []
    for hierarchy in rows[0] if rows else {}:
        field = mapper.field_for(hierarchy)
        if field:
            dim_fields.append(field)

    row_records = []
    for idx, tup in enumerate(rows):
        rec = {"__row_idx": idx}
        for hierarchy, caption in tup.items():
            field = mapper.field_for(hierarchy)
            if field:
                rec[field] = caption
        row_records.append(rec)
    row_schema = T.StructType(
        [T.StructField("__row_idx", T.LongType(), False)]
        + [T.StructField(f, T.StringType(), True) for f in dim_fields]
    )
    dims_df = spark.createDataFrame(row_records, schema=row_schema)

    cell_schema = T.StructType(
        [T.StructField("ordinal", T.LongType(), False), T.StructField("value", T.StringType(), True)]
    )
    cells_df = spark.createDataFrame(list(cells.items()), schema=cell_schema)

    # the ordinal invariant, as plan expressions
    coo = cells_df.select(
        (F.col("ordinal") / n_measures).cast("long").alias("__row_idx"),
        (F.col("ordinal") % n_measures).cast("int").alias("__col_idx"),
        F.col("value"),
    )
    measure_names = [m or f"measure_{i}" for i, m in enumerate(measures)]
    pivoted = (
        coo.groupBy("__row_idx")
        .pivot("__col_idx", list(range(n_measures)))
        .agg(F.first("value"))
    )
    for i, name in enumerate(measure_names):
        pivoted = pivoted.withColumnRenamed(str(i), name)
    # numeric coercion with string fallback (generic_xmla_parser.py:128-148)
    for name in measure_names:
        pivoted = pivoted.withColumn(name, F.col(name).try_cast("double"))

    return dims_df.join(pivoted, "__row_idx", "left").drop("__row_idx")


def fetch_partitioned(
    spark: SparkSession,
    execute: Callable[[str], str],
    mdx_by_slice: dict[str, str],
    hierarchy_mappings: Iterable[dict[str, str]],
) -> DataFrame:
    """Partitioned cube read: one XMLA query per slice (fiscal year /
    period), unioned — the Spark analogue of the reference's per-FY
    query splitting (``modules/olap_sync.py:111-151``), except the
    slices land as DataFrame partitions instead of pandas concat.

    ``execute`` is the transport (mdx -> xml); injected so tests replay
    canned responses and production supplies an HTTP SOAP client.
    """
    from functools import reduce

    frames = [
        response_to_df(spark, execute(mdx), hierarchy_mappings).withColumn(
            "__slice", F.lit(slice_name)
        )
        for slice_name, mdx in mdx_by_slice.items()
    ]
    return reduce(DataFrame.unionByName, frames)


def fetch_partitioned_distributed(
    spark: SparkSession,
    execute_factory: Callable[[], Callable[[str], str]],
    mdx_by_slice: dict[str, str],
    hierarchy_mappings: Iterable[dict[str, str]],
    dim_fields: Sequence[str],
    measure_fields: Sequence[str],
) -> DataFrame:
    """Executor-side partitioned cube read: each slice's SOAP call AND
    its XML flatten run on an executor (``mapInPandas``, one slice per
    partition, Arrow-batched out) — the scale form of
    :func:`fetch_partitioned`, whose driver loop serializes the fetches
    (parity with reference ``modules/olap_sync.py:111-151``, but a
    bottleneck for e.g. the 39-fiscal-period backfill,
    ``backfill_sales_channel_by_period.sh:14-25``).

    Unlike the driver path, the output schema is declared, not
    response-derived: ``dim_fields`` (strings) + ``measure_fields``
    (doubles, numeric-with-null fallback exactly like the driver
    path's try_cast). ``execute_factory`` is invoked executor-side, so
    sockets/credentials are built next to their use, never pickled —
    the same seam as odata.read_paged_partitioned.
    """
    import pandas as pd

    slices = sorted(mdx_by_slice.items())
    sl = spark.createDataFrame(
        [(i, name, mdx) for i, (name, mdx) in enumerate(slices)],
        "slice_idx int, slice_name string, mdx string",
    ).repartitionByRange(max(len(slices), 1), "slice_idx")
    mappings = [dict(m) for m in hierarchy_mappings]
    dims = list(dim_fields)
    meas = list(measure_fields)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        execute = execute_factory()
        mapper = HierarchyMapper(mappings)
        for pdf in batches:
            for slice_name, mdx in zip(pdf["slice_name"], pdf["mdx"]):
                measures, rows, cells = parse_axes_and_cells(execute(mdx))
                if not rows:
                    continue
                n_m = max(len(measures), 1)
                col_idx = {m: j for j, m in enumerate(measures)}
                data: dict[str, list] = {"__slice": [slice_name] * len(rows)}
                for d in dims:
                    data[d] = [None] * len(rows)
                for m in meas:
                    data[m] = [None] * len(rows)
                for ridx, tup in enumerate(rows):
                    for hierarchy, caption in tup.items():
                        f = mapper.field_for(hierarchy)
                        if f in data:
                            data[f][ridx] = caption
                    for m in meas:
                        j = col_idx.get(m)
                        if j is None:
                            continue
                        v = cells.get(ridx * n_m + j)
                        if v is not None:
                            try:
                                data[m][ridx] = float(v)
                            except (TypeError, ValueError):
                                pass  # string cell -> null measure, as try_cast
                yield pd.DataFrame(data)

    schema = T.StructType(
        [T.StructField("__slice", T.StringType(), True)]
        + [T.StructField(d, T.StringType(), True) for d in dims]
        + [T.StructField(m, T.DoubleType(), True) for m in meas]
    )
    return sl.mapInPandas(run, schema)


def render_mddataset(
    measures: Sequence[str],
    row_tuples: Sequence[Sequence[tuple[str, str]]],
    cell_values: Sequence[Sequence[object]],
) -> str:
    """Inverse of :func:`parse_axes_and_cells`: render an XMLA
    mddataset response (Axis0 = measures, Axis1 = row tuples of
    (hierarchy, caption) pairs, row-major cells). Test/fixture
    builders share this instead of hand-assembling the XML; round-trip
    with the parser is what the S1/S2 gates verify.

    Captions, values, and hierarchy names are XML-escaped (escape /
    quoteattr), so captions containing ``&``, ``<`` or quotes still
    produce well-formed XML — ElementTree unescapes on parse, keeping
    the round-trip lossless."""
    from xml.sax.saxutils import escape, quoteattr

    axis0 = "".join(
        f'<Tuple><Member Hierarchy="[Measures]"><Caption>{escape(str(m))}</Caption></Member></Tuple>'
        for m in measures
    )
    axis1 = "".join(
        "<Tuple>"
        + "".join(
            f"<Member Hierarchy={quoteattr(str(h))}><Caption>{escape(str(c))}</Caption></Member>"
            for h, c in tup
        )
        + "</Tuple>"
        for tup in row_tuples
    )
    n_m = max(len(measures), 1)
    cells = "".join(
        f'<Cell CellOrdinal="{i * n_m + j}"><Value>{escape(str(v))}</Value></Cell>'
        for i, row in enumerate(cell_values)
        for j, v in enumerate(row)
        if v is not None
    )
    return (
        '<root xmlns="urn:schemas-microsoft-com:xml-analysis:mddataset">'
        f'<Axes><Axis name="Axis0"><Tuples>{axis0}</Tuples></Axis>'
        f'<Axis name="Axis1"><Tuples>{axis1}</Tuples></Axis></Axes>'
        f"<CellData>{cells}</CellData></root>"
    )


def build_soap_request(mdx: str, catalog: str) -> str:
    """XMLA Execute SOAP envelope (shape per the public XMLA spec;
    the reference builds the same envelope in ``modules/olap.py:7-46``)."""
    from xml.sax.saxutils import escape

    return f"""<?xml version="1.0" encoding="UTF-8"?>
<soap:Envelope xmlns:soap="http://schemas.xmlsoap.org/soap/envelope/">
  <soap:Body>
    <Execute xmlns="urn:schemas-microsoft-com:xml-analysis">
      <Command><Statement><![CDATA[{mdx}]]></Statement></Command>
      <Properties><PropertyList>
        <Catalog>{escape(catalog)}</Catalog>
        <Format>Multidimensional</Format>
      </PropertyList></Properties>
    </Execute>
  </soap:Body>
</soap:Envelope>"""

"""File sources: CSV with the reference's dirty-input discipline, plus
an Excel reader gated behind openpyxl availability.

The reference's CSV path (``load_csv.py:41-81``,
``tests/load_csv_to_dataverse.py:349-410``) reads header-row CSV as
strings and cleans per-row: multi-format dates, ``'' '-' 'NULL' ' '``
null tokens, comma-grouped decimals, int truncation. Here the scan is
``spark.read.csv`` with an all-string schema (never inferSchema — the
dirty values ARE strings) and the cleaning is the coercion expression
vocabulary, applied lazily so Catalyst fuses scan+clean into one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_raw(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Header CSV -> all-string DataFrame (the reference's DictReader
    stage). Column list optional: when given, enforces presence and
    order; otherwise the header is trusted.
    """
    reader = (
        spark.read.option("header", "true")
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if columns:
        schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
        df = reader.schema(schema).csv(path)
    else:
        df = reader.csv(path)  # all columns default to string without inferSchema
    return df


def normalize_headers(df: DataFrame, rename: dict[str, str]) -> DataFrame:
    """Reference-style header mapping, e.g. ``'Store Number Label' ->
    'store_number'`` (``tests/load_csv_to_dataverse.py:8-18``)."""
    out = df
    for src, dst in rename.items():
        if src in out.columns:
            out = out.withColumnRenamed(src, dst)
    return out


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: str | int = 0,
    header_row: int = 0,
) -> DataFrame:
    """Excel scan (reference ``load_store_hours.py:64-108``).

    Prefers openpyxl/pandas when present; otherwise falls back to a
    minimal stdlib xlsx reader (xlsx is a zip of SpreadsheetML — the
    OOXML spec is public), good for the master-data-sized workbooks
    the reference loads: inline + shared strings, numbers, header row,
    blank-row skipping. Driver-side read, then ``createDataFrame`` —
    workbooks are dimension-sized by construction.
    """
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet, header=header_row, dtype=str)
        pdf = pdf.dropna(how="all")
        return spark.createDataFrame(pdf)
    except ImportError:
        rows = _read_xlsx_stdlib(path, sheet_index=sheet if isinstance(sheet, int) else 0)
    rows = [r for r in rows[header_row:] if any(v not in (None, "") for v in r)]
    if not rows:
        raise ValueError(f"no data rows in {path}")
    header, data = rows[0], rows[1:]
    width = len(header)
    schema = T.StructType([T.StructField(str(h), T.StringType(), True) for h in header])
    padded = [tuple((r + [None] * width)[:width]) for r in data]
    return spark.createDataFrame(padded, schema=schema)


def write_minimal_xlsx(path: str, header: list, rows: list[list]) -> None:
    """Hand-built SpreadsheetML workbook (inline strings only) — the
    deterministic fixture twin of ``read_excel``'s stdlib path, used by
    tests and the s8 registry query to synthesize workbooks without any
    Excel library. Values are XML-escaped; ``None`` cells are omitted
    (how Excel stores blanks)."""
    import zipfile
    from xml.sax.saxutils import escape

    def row_xml(r_idx: int, values: list) -> str:
        cells = []
        for c_idx, v in enumerate(values):
            col = ""
            i = c_idx
            while True:
                col = chr(ord("A") + i % 26) + col
                i = i // 26 - 1
                if i < 0:
                    break
            if v is None:
                continue
            cells.append(
                f'<c r="{col}{r_idx}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'
            )
        return f'<row r="{r_idx}">{"".join(cells)}</row>'

    all_rows = [list(header)] + [list(r) for r in rows]
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        + "".join(row_xml(i + 1, r) for i, r in enumerate(all_rows))
        + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            "</Types>",
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>',
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def xlsx_date_system(path: str) -> int:
    """The workbook's date epoch: 1900 (default) or 1904 (the Mac
    system, ``<workbookPr date1904="1"/>`` — a PUBLIC OOXML feature
    real exports still carry). Date cells store day serials; the same
    serial means a different calendar date under each system, so any
    caller coercing Excel serials must ask this first."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        if "xl/workbook.xml" not in z.namelist():
            return 1900
        root = ET.fromstring(z.read("xl/workbook.xml"))
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    pr = root.find(f"{ns}workbookPr")
    if pr is not None and pr.get("date1904", "0").lower() in ("1", "true"):
        return 1904
    return 1900


def excel_serial_to_date(serial: int | float | str | None, date_system: int = 1900):
    """Excel day serial -> datetime.date under the workbook's epoch.

    - 1904 system: serial 0 = 1904-01-01 (no leap-bug offset).
    - 1900 system: serial 1 = 1900-01-01, but serial 60 is the
      NONEXISTENT 1900-02-29 (the inherited Lotus 1-2-3 bug): serials
      >= 61 are anchored at 1899-12-30, 1..59 at 1899-12-31, and 60
      itself returns None (openpyxl raises for it; a null is this
      engine's dirty-value discipline).
    Out-of-domain serials — negative under either system, or 0 under
    1900 (Excel renders it as the fake "1/0/1900") — are dirty values
    and return None too. Fractional day parts (times) are truncated;
    None/'' pass through as None."""
    import datetime

    if serial in (None, ""):
        return None
    s = int(float(serial))
    if date_system == 1904:
        if s < 0:
            return None
        return datetime.date(1904, 1, 1) + datetime.timedelta(days=s)
    if s <= 0 or s == 60:
        return None
    anchor = datetime.date(1899, 12, 30) if s >= 61 else datetime.date(1899, 12, 31)
    return anchor + datetime.timedelta(days=s)


def _read_xlsx_stdlib(path: str, sheet_index: int = 0) -> list[list[str | None]]:
    """Minimal SpreadsheetML reader: zipfile + ElementTree, shared and
    inline strings (including multi-run rich text — every ``<t>`` under
    an ``<si>``/``<is>`` concatenates), boolean cells surfaced as
    'TRUE'/'FALSE' (the raw '1'/'0' is indistinguishable from a
    number), formula cells read by their cached ``<v>``. Date serials
    come back as the raw stored strings — epoch-aware coercion is the
    caller's job via :func:`xlsx_date_system` +
    :func:`excel_serial_to_date`, exactly like the CSV path."""
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{ns['m']}}}t")))
        sheet_names = sorted(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(z.read(sheet_names[sheet_index]))

    def col_index(ref: str) -> int:
        letters = "".join(ch for ch in ref if ch.isalpha())
        idx = 0
        for ch in letters:
            idx = idx * 26 + (ord(ch.upper()) - 64)
        return idx - 1

    out: list[list[str | None]] = []
    for row in root.iter(f"{{{ns['m']}}}row"):
        cells: dict[int, str | None] = {}
        for c in row.findall("m:c", ns):
            ref, typ = c.get("r", ""), c.get("t", "n")
            v = c.find("m:v", ns)
            ist = c.find("m:is", ns)
            if typ == "s" and v is not None:
                val = shared[int(v.text)]
            elif typ == "inlineStr" and ist is not None:
                val = "".join(t.text or "" for t in ist.iter(f"{{{ns['m']}}}t"))
            elif typ == "b" and v is not None:
                val = "TRUE" if v.text == "1" else "FALSE"
            else:
                val = v.text if v is not None else None
            cells[col_index(ref)] = val
        width = max(cells) + 1 if cells else 0
        out.append([cells.get(i) for i in range(width)])
    return out


def read_jsonl_raw(
    spark: SparkSession,
    path: str,
    columns: list[str],
) -> DataFrame:
    """JSON-lines scan with the same dirty-input discipline as the CSV
    path: every field read as STRING against an explicit schema (never
    schema inference — sampling jobs at 100 TB are a scan of their
    own, and the dirty values ARE strings), cleaning deferred to the
    coercion expression vocabulary so Catalyst fuses scan+clean.
    Unparseable lines surface in ``_corrupt_record`` instead of
    failing the scan (PERMISSIVE, the engine's corrupt-blob contract).
    """
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in columns]
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_xml_raw(
    spark: SparkSession,
    path: str,
    columns: list[str],
    row_tag: str = "o",
) -> DataFrame:
    """XML scan (Spark 4 built-in ``xml`` source) with the same
    dirty-input discipline as the CSV/JSONL paths: every field read as
    STRING against an explicit schema (never inference), cleaning
    deferred to the coercion expression vocabulary. Attribute fields
    use the source's ``_``-prefix convention (``k="1"`` → column
    ``_k``). PERMISSIVE + ``_corrupt_record``, with the XML-specific
    caveat that a malformed record poisons the REMAINDER OF ITS FILE
    (XML has no line framing to resynchronize on, unlike JSONL): the
    tail of a broken file lands as one corrupt record. Corruption
    accounting is therefore per-file — the realistic failure unit for
    XML drops (one truncated export among many)."""
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in columns]
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .format("xml")
        .load(path)
    )

"""Type-coercion expressions — the engine's scalar cast vocabulary.

Re-expresses the reference's central ``_coerce(value, typ)`` dispatcher
(reference ``modules/pipeline_runner.py:81-130``) and the CSV loader's
dirty-value handling (reference ``load_csv.py:44-63``) as vectorized
Catalyst expressions. Behavior parity notes:

- int coercion strips thousands separators then truncates toward zero
  (``int(float(s))`` in the reference, ``modules/transformers.py:63-65``),
- decimal coercion strips commas and treats ``'' '-' 'NULL' ' '`` as
  null tokens (``load_csv.py:57-60``),
- date coercion is **date-only**: calendar dates never become
  timestamps, so no session-timezone day-shift is possible
  (``modules/pipeline_runner.py:89-100``),
- datetime coercion assumes UTC for naive inputs and emits an
  ISO-8601 ``...Z`` instant (``modules/pipeline_runner.py:114-128``).

Everything here is a pure ``Column -> Column`` function: JVM-side,
whole-stage-codegen friendly, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: String values the reference's CSV path treats as null (load_csv.py:57-60).
NULL_TOKENS = ("", "-", "NULL", "null", "N/A", "n/a")

# Date formats tried in order by the reference (load_csv.py:46-51).
_DATE_FORMATS = ("yyyy-MM-dd", "M/d/yyyy", "M/d/yy")


def normalize_null_tokens(c: Column) -> Column:
    """Map the reference's null-token vocabulary to real NULLs (C3)."""
    trimmed = F.trim(c)
    return F.when(trimmed.isin(*NULL_TOKENS), F.lit(None)).otherwise(trimmed)


def to_clean_string(c: Column) -> Column:
    """String coercion: trim, null-token normalize (C1 string branch)."""
    return normalize_null_tokens(c.cast("string"))


def to_int_truncating(c: Column) -> Column:
    """Int coercion with comma stripping and float truncation (C2).

    ``"1,234.9" -> 1234`` — truncation toward zero, matching the
    reference's ``int(float(s.replace(',', '')))``.
    """
    s = normalize_null_tokens(c.cast("string"))
    d = F.regexp_replace(s, ",", "").try_cast("double")
    # int(float(x)) truncates toward zero; double->int cast in Spark does too.
    return d.try_cast("int")


def to_decimal(c: Column, precision: int = 13, scale: int = 2) -> Column:
    """Decimal coercion with comma stripping + null tokens (C3).

    The reference's Dataverse decimal columns are precision-2 in
    ±1e11 — ``DecimalType(13,2)`` (SURVEY.md §1.3).
    """
    s = normalize_null_tokens(c.cast("string"))
    return F.regexp_replace(s, ",", "").try_cast(f"decimal({precision},{scale})")


def to_date_multiformat(c: Column) -> Column:
    """Multi-format date parse: strip any ``T...`` time suffix, then
    dispatch on the string's *shape* (C4 + C6). Emits ``DateType`` —
    never a timestamp — to preserve date-only semantics.

    Shape-gating (rather than try-formats-in-order) makes the parse
    unambiguous: ``1/5/95`` can never be read as year 95, and the
    behavior is reproducible in any engine.
    """
    s = F.regexp_replace(normalize_null_tokens(c.cast("string")), "T.*$", "")
    iso = s.rlike(r"^\d{4}-\d{2}-\d{2}$")
    mdy4 = s.rlike(r"^\d{1,2}/\d{1,2}/\d{4}$")
    mdy2 = s.rlike(r"^\d{1,2}/\d{1,2}/\d{2}$")
    # two-digit years use the C/python-strptime pivot (69-99 -> 19xx,
    # 00-68 -> 20xx) — Spark's own 'yy' pattern would say 95 -> 2095,
    # which diverges from the reference's dateutil/strptime behavior
    parts = F.split(s, "/")
    yy = parts[2].try_cast("int")
    pivot_year = F.when(yy >= 69, yy + 1900).otherwise(yy + 2000)
    mdy2_date = F.make_date(pivot_year, parts[0].try_cast("int"), parts[1].try_cast("int"))
    parsed = (
        F.when(iso, F.try_to_timestamp(s, F.lit("yyyy-MM-dd")).cast("date"))
        .when(mdy4, F.try_to_timestamp(s, F.lit("M/d/yyyy")).cast("date"))
        .when(mdy2, mdy2_date)
    )
    return parsed


def to_utc_instant(c: Column) -> Column:
    """Datetime coercion (C5): parse, treat naive values as UTC.

    With the session timezone pinned to UTC (session.py), a parsed
    naive timestamp IS the UTC instant, matching the reference's
    ``assume UTC if naive`` rule.
    """
    return c.try_cast("timestamp")


def format_iso_z(c: Column) -> Column:
    """Render a timestamp as the reference's ISO ``...Z`` wire format."""
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def time_to_hhmm(c: Column) -> Column:
    """Normalize loose time encodings to ``HH:MM`` (C7).

    ``100 -> '01:00'``, ``1100 -> '11:00'``, ``'9:30' -> '09:30'``,
    ``'09:30:00' -> '09:30'`` — reference ``load_store_hours.py:33-61``.
    """
    s = F.trim(c.cast("string"))
    digits = F.regexp_replace(s, "[^0-9]", "")
    # 'HH:MM[:SS]' styled input: take first two fields, zero-pad hour.
    colon = F.concat(
        F.lpad(F.split(s, ":")[0], 2, "0"), F.lit(":"), F.rpad(F.split(s, ":")[1], 2, "0")
    )
    # bare integers: 100 -> 0100, 1100 -> 1100, then split
    padded = F.lpad(digits, 4, "0")
    from_int = F.concat(F.substring(padded, 1, 2), F.lit(":"), F.substring(padded, 3, 2))
    return F.when(s.isNull() | (s == ""), F.lit(None)).when(s.contains(":"), colon).otherwise(from_int)


def day_part(hour_col: Column) -> Column:
    """Named day-part bucketing (C10), hour ranges from the reference's
    ``labor_processing.day_parts`` config: Morning 8-10, Lunch 10-14,
    Afternoon 14-17, Dinner 17-21, Evening 21-24, Late Night 0-8.
    """
    h = hour_col
    return (
        F.when((h >= 8) & (h < 10), "Morning")
        .when((h >= 10) & (h < 14), "Lunch")
        .when((h >= 14) & (h < 17), "Afternoon")
        .when((h >= 17) & (h < 21), "Dinner")
        .when(h >= 21, "Evening")
        .otherwise("Late Night")
    )

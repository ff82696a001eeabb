"""Business-key derivation and key hygiene.

The reference keys every target row on a synthetic alternate key built
by a format template over cleaned dimension values, e.g.
``{Store}_{Date:%Y%m%d}_{Actor}_{Channel}_{DayPart}``
(reference ``modules/transformers.py:50-56``, ``load_csv.py:65``,
``modules/pipeline_runner.py:197-213``). Cleaning: spaces and hyphens
become underscores; missing components default to ``'Unknown'``.

All expressed as Catalyst expressions (``concat_ws`` + ``date_format``)
— the key is computed in whole-stage codegen, not per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_DATE_FORMAT = "yyyyMMdd"


def clean_key_component(c: Column, default: str = "Unknown") -> Column:
    """Space/hyphen -> underscore; null/empty -> default (P4)."""
    cleaned = F.regexp_replace(F.trim(c.cast("string")), "[ -]", "_")
    return F.when(cleaned.isNull() | (cleaned == ""), F.lit(default)).otherwise(cleaned)


def key_date(c: Column) -> Column:
    """Date component rendered ``yyyyMMdd`` (C8)."""
    return F.date_format(c.cast("date"), KEY_DATE_FORMAT)


def business_key(*components: Column, sep: str = "_") -> Column:
    """Join pre-rendered components with the key separator (P3).

    ``concat_ws`` skips nulls, which would silently shorten keys; the
    caller is expected to have defaulted components via
    ``clean_key_component`` so a missing part is 'Unknown', not absent.
    """
    return F.concat_ws(sep, *components)


def display_name(*components: Column) -> Column:
    """Human display name, ``" - "``-joined (P5,
    reference ``modules/transformers.py:78``)."""
    return F.concat_ws(" - ", *components)


def escape_odata_quotes(c: Column) -> Column:
    """``' -> ''`` for key addressing in OData URLs (C9,
    reference ``modules/dataverse.py:79``)."""
    return F.regexp_replace(c, "'", "''")

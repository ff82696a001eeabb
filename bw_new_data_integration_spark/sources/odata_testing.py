"""Deterministic in-memory OData server for the paged reader (S9).

Stands in for a live OData endpoint the same way the multimodal stub
decoder stands in for image/audio libs: the *protocol* behavior is real
— ``$select`` projection, ``$filter`` equality slices, ``$top`` page
sizing, server-issued opaque ``@odata.nextLink`` continuation
(reference ``load_store_hours.py:111-138``,
``full_refresh_fy2023_2025.py:78-101``) — while the data behind it is
whatever records the test or query seeds it with. Tests and the
``s9_odata_scan`` registry query both drive the production reader
(`sources/odata.py:read_paged*`) through this server, so the page-walk,
projection, and slicing logic is exercised end-to-end.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode


class InMemoryODataServer:
    """Serves a list of record dicts through the OData paging protocol.

    Supported query options (the subset the reference uses):
    - ``$select=a,b,c`` — project each record to those fields,
    - ``$filter=f eq v [and g eq w ...]`` — equality conjunctions
      (values: single-quoted strings or numeric literals),
    - ``$top=N`` — page size,
    - ``$skiptoken=K`` — continuation offset; ONLY the server mints it,
      inside the ``@odata.nextLink`` it returns (clients must treat the
      link as opaque).
    """

    def __init__(self, records: list[dict], page_size_cap: int = 5000) -> None:
        self.records = records
        self.page_size_cap = page_size_cap
        self.requests_served = 0
        # filter-result cache: a real server resolves $filter with an
        # index; without this the fake re-scans every record per page
        # request (O(n) per page → O(n²/page_size) per slice walk) and
        # the benchmark measures the fake, not the reader under test
        self._filter_cache: dict[str | None, list[dict]] = {}

    # -- OData literal / filter parsing ------------------------------------

    @staticmethod
    def _literal(tok: str):
        if tok.startswith("'") and tok.endswith("'"):
            return tok[1:-1].replace("''", "'")
        try:
            return int(tok)
        except ValueError:
            return float(tok)

    def _matches(self, rec: dict, filter_expr: str | None) -> bool:
        if not filter_expr:
            return True
        for clause in filter_expr.split(" and "):
            field, op, value = clause.split(" ", 2)
            if op != "eq":
                raise ValueError(f"unsupported $filter operator: {op}")
            if rec.get(field) != self._literal(value):
                return False
        return True

    # -- the server --------------------------------------------------------

    def _matched(self, flt: str | None) -> list[dict]:
        matched = self._filter_cache.get(flt)
        if matched is None:
            matched = [r for r in self.records if self._matches(r, flt)]
            self._filter_cache[flt] = matched
        return matched

    def fetch(self, url: str) -> dict:
        self.requests_served += 1
        entity, _, qs = url.partition("?")
        params = dict(parse_qsl(qs, keep_blank_values=True))
        select = params.get("$select")
        flt = params.get("$filter")
        top = min(int(params.get("$top", self.page_size_cap)), self.page_size_cap)
        offset = int(params.get("$skiptoken", 0))

        matched = self._matched(flt)
        page = matched[offset : offset + top]
        if select:
            fields = select.split(",")
            page = [{f: r.get(f) for f in fields} for r in page]
        out = {"value": page}
        if offset + top < len(matched):
            nxt = dict(params)
            nxt["$skiptoken"] = str(offset + top)
            out["@odata.nextLink"] = f"{entity}?{urlencode(nxt)}"
        return out


class ParquetBackedODataServer(InMemoryODataServer):
    """An InMemoryODataServer whose table is a PARQUET FILE, loaded
    lazily with the ``$filter`` pushed down to the read (VERDICT r8
    #8: distributed fixture synthesis).

    What ships in a ``fetch_factory`` closure is the path string, not
    the rows — so the s9 paged-scan gate can run at ANY scale factor:
    each executor-side slice walk reads only its own slice's rows
    (pyarrow predicate pushdown on the equality conjunction), never
    the whole table, and the driver never collects fixture rows at
    all. The paging/projection/continuation protocol is inherited
    unchanged."""

    def __init__(
        self, path: str, columns: list[str] | None = None, page_size_cap: int = 5000
    ) -> None:
        super().__init__([], page_size_cap)
        self.path = path
        self.columns = list(columns) if columns else None

    def _matched(self, flt: str | None) -> list[dict]:
        matched = self._filter_cache.get(flt)
        if matched is None:
            import pyarrow.parquet as pq

            filters = None
            if flt:
                filters = []
                for clause in flt.split(" and "):
                    field, op, value = clause.split(" ", 2)
                    if op != "eq":
                        raise ValueError(f"unsupported $filter operator: {op}")
                    filters.append((field, "==", self._literal(value)))
            matched = pq.read_table(
                self.path, columns=self.columns, filters=filters
            ).to_pylist()
            self._filter_cache[flt] = matched
        return matched

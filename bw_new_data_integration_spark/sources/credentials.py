"""Credential/token seam for REST sources and sinks.

The reference resolves secrets at startup and then refreshes its OAuth
bearer token in two ways during long loads:

- **proactively by age** — a multi-hour CSV load re-acquires the token
  when it is older than 45 minutes, before the old one expires
  (``tests/load_csv_to_dataverse.py:346-379``),
- **reactively on 401/403** — the full-refresh driver re-authenticates
  and retries when a request comes back unauthorized
  (``full_refresh_fy2023_2025.py:73-75``).

Both behaviors live here as an injectable, provider-agnostic seam: the
engine never sees endpoints or vaults, only a ``fetch() -> str``
callable supplied by the caller (production wires a real OAuth client;
tests wire a counter). A ``TokenProvider`` is built executor-side
inside a transport factory — one per partition, next to the socket it
authenticates — so nothing secret is ever pickled from the driver.
"""

from __future__ import annotations

import time
from collections.abc import Callable

#: the reference refreshes proactively at 45 minutes
DEFAULT_MAX_AGE_SECONDS = 45 * 60


class TokenProvider:
    """Caches a bearer token, refreshing it proactively by age and on
    demand after an auth failure.

    ``fetch`` acquires a fresh token (the only provider-specific part).
    ``token()`` returns the cached token, re-fetching if older than
    ``max_age_seconds``. ``invalidate()`` drops the cache so the next
    ``token()`` re-fetches — wired to the sink's 401/403 handling.
    """

    def __init__(
        self,
        fetch: Callable[[], str],
        max_age_seconds: float = DEFAULT_MAX_AGE_SECONDS,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self._fetch = fetch
        self._max_age = max_age_seconds
        self._clock = clock
        self._token: str | None = None
        self._acquired_at = 0.0

    def token(self) -> str:
        if self._token is None or (self._clock() - self._acquired_at) > self._max_age:
            self.refresh()
        assert self._token is not None
        return self._token

    def refresh(self) -> None:
        self._token = self._fetch()
        self._acquired_at = self._clock()

    def invalidate(self) -> None:
        self._token = None

"""Run-summary notifications (SURVEY.md §2.11).

The reference emails a success/failure summary after every sync via
Microsoft Graph ``sendMail`` (reference ``modules/olap_sync.py:401-437``,
``modules/notifications.py:36-139``): pipeline name, row counts,
created/updated/error tallies, duration, and the error text on failure.

Here the summary is a plain dataclass and the delivery channel is an
injectable callable — tests capture messages in a list, production
wires SMTP/Graph/Slack. No engine code imports a mail client.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable
from dataclasses import dataclass, field

Sender = Callable[[str, str], None]  # (subject, body) -> None


@dataclass
class RunSummary:
    pipeline: str
    rows: int = 0
    created: int = 0
    updated: int = 0
    errors: int = 0
    seconds: float = 0.0
    ok: bool = True
    error_text: str = ""
    extra: dict = field(default_factory=dict)

    def subject(self) -> str:
        status = "SUCCESS" if self.ok else "FAILURE"
        return f"[pipeline:{self.pipeline}] {status}"

    def body(self) -> str:
        lines = [
            f"pipeline: {self.pipeline}",
            f"status: {'ok' if self.ok else 'FAILED'}",
            f"rows: {self.rows}",
            f"created: {self.created}",
            f"updated: {self.updated}",
            f"errors: {self.errors}",
            f"seconds: {self.seconds:.2f}",
        ]
        lines += [f"{k}: {v}" for k, v in sorted(self.extra.items())]
        if not self.ok and self.error_text:
            lines += ["", "error:", self.error_text]
        return "\n".join(lines)


def notify(summary: RunSummary, sender: Sender) -> None:
    sender(summary.subject(), summary.body())


def run_with_notification(
    pipeline: str, fn: Callable[[], dict], sender: Sender
) -> dict:
    """Run a pipeline callable, send a summary either way, re-raise on
    failure — the reference's try/except-email wrapper
    (``modules/olap_sync.py:401-437``)."""
    import time

    t0 = time.time()
    try:
        result = fn()
    except Exception as exc:
        summary = RunSummary(
            pipeline=pipeline,
            ok=False,
            seconds=time.time() - t0,
            error_text="".join(traceback.format_exception_only(type(exc), exc)).strip(),
        )
        notify(summary, sender)
        raise
    summary = RunSummary(
        pipeline=pipeline,
        rows=int(result.get("rows", 0)),
        created=int(result.get("created", 0)),
        updated=int(result.get("updated", 0)),
        errors=int(result.get("errors", 0)),
        seconds=time.time() - t0,
        ok=True,
    )
    notify(summary, sender)
    return result

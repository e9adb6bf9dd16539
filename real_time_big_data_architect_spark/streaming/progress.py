"""Micro-batch progress capture for the streaming surface.

Every streaming run site records its StreamingQuery's progress events
here after the drain, so a harness (tools/latency.py) can attribute
batch durations / state rows / state memory to the declared query that
started the stream — without touching the query functions' signatures
or adding a listener race. The capture is append-only per process;
consumers snapshot-and-diff around each query invocation.

This is the measurement the reference's 60 s poll tick implies
(`/root/reference/app.py:37` — st_autorefresh(interval=60_000)): a
micro-batch pipeline keeps up iff batch duration ≪ trigger interval.
LATENCY.md is the per-round artifact proving it.
"""

from __future__ import annotations

import json
from typing import Any

#: (sink/query name, [progress event dicts]) per completed drain, in
#: start order. Consumers snapshot-and-diff; a soft cap below keeps a
#: long-lived session (thousands of drains) from growing unboundedly.
RUNS: list[tuple[str, list[dict[str, Any]]]] = []

_RUNS_CAP = 4096


def record(q: Any) -> None:
    """Append a completed StreamingQuery's recentProgress to RUNS.

    Tolerant of the PySpark version's progress representation (JSON
    strings, objects with a ``.json``, or plain dicts) and never raises:
    progress capture must not fail a correctness run.
    """
    try:
        events = []
        for p in q.recentProgress or []:
            if isinstance(p, dict):
                events.append(p)
            elif isinstance(p, str):
                events.append(json.loads(p))
            elif hasattr(p, "json"):
                events.append(json.loads(p.json))
        RUNS.append((str(getattr(q, "name", "") or q.id), events))
        if len(RUNS) > _RUNS_CAP:
            del RUNS[: len(RUNS) - _RUNS_CAP]
    except Exception:  # noqa: BLE001 — diagnostics only, never fatal
        pass

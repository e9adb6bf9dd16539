"""Generate INVENTORY.md: every declared query, its module, and its
correctness-check mode. Run ``python tools/inventory.py``."""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_architect_spark.plans import workload  # noqa: E402


def main() -> None:
    oracles = workload.build_oracle_sql()
    rows = []
    for mod in workload._MODULES:
        modname = mod.__name__.rsplit(".", 1)[-1]
        for name in mod.QUERIES:
            rows.append((name, modname, name in oracles))

    by_mode = Counter("oracle" if o else "rows-only" for _, _, o in rows)
    if by_mode["rows-only"]:
        tail = (
            f"{by_mode['rows-only']} rows-only (hash-seeded / "
            "streaming-emission / fp-tie semantics — locked by unit "
            "tests instead; see tests/)."
        )
    else:
        tail = (
            "0 rows-only — every declared query is oracle-backed "
            "(streaming drains/emissions via batch reconstruction, "
            "approximate sketches and PCA via certification oracles; "
            "per-row APIs whose values a SQL oracle cannot replay — "
            "pca_project's eigensolve scores — live outside the "
            "declared surface as unit-tested library functions)."
        )
    lines = [
        "# INVENTORY — declared queries (driver contract)",
        "",
        f"{len(rows)} queries: {by_mode['oracle']} oracle-backed "
        "(DuckDB differential: row count + schema + order-insensitive "
        f"value hash at sf0.01), " + tail,
        "",
        "| query | module | check |",
        "|---|---|---|",
    ]
    for name, modname, has_oracle in rows:
        lines.append(
            f"| `{name}` | {modname} | "
            f"{'oracle' if has_oracle else 'rows-only'} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "INVENTORY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} queries "
          f"({by_mode['oracle']} oracle / {by_mode['rows-only']} rows-only)")


if __name__ == "__main__":
    main()

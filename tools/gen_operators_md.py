"""Generate OPERATORS.md — the implemented-operator inventory cross-
referencing SURVEY.md §2, from the live registry (single source of truth).

Run: python tools/gen_operators_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycaim_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402


def main() -> None:
    _ensure_loaded()
    lines = [
        "# OPERATORS — implemented inventory (generated from the registry)",
        "",
        "Cross-reference for SURVEY.md §2: every registered query, its check",
        "mode, and its one-line contract. Regenerate with",
        "`python tools/gen_operators_md.py`.",
        "",
        f"**{len(REGISTRY)} queries — "
        f"{sum(1 for s in REGISTRY.values() if s.oracle)} DuckDB-oracle-checked, "
        f"{sum(1 for s in REGISTRY.values() if not s.oracle)} rows-only "
        "(each with a stated reason and a property/twin test).**",
        "",
        "| query id | check | summary |",
        "| --- | --- | --- |",
    ]
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        check = "oracle" if spec.oracle else f"rows-only — {spec.rows_only_reason}"
        summary = (spec.doc.splitlines() or [""])[0]
        lines.append(f"| `{name}` | {check} | {summary} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(REGISTRY)} rows")


if __name__ == "__main__":
    main()

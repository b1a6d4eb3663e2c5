#!/usr/bin/env python
"""Generate docs/CATALOG.md from the operator registry: one line per key
(section, oracle kind, first docstring sentence). Run after adding keys;
tests/test_entry.py::test_catalog_in_sync keeps it honest."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdp_spark.plans.registry import load_all


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text.split(stop)[0] + "."
    return text[:160]


def render() -> str:
    specs = load_all()
    by_sec: dict[str, list] = {}
    for k, s in specs.items():
        by_sec.setdefault(s.section, []).append((k, s))
    lines = [
        "# Operator catalog",
        "",
        f"{len(specs)} operator keys. `hash` = full DuckDB value-hash oracle; "
        "`rows-only` = invariant-pinned (probabilistic / iterative / "
        "stateful semantics DuckDB cannot replay).",
        "",
    ]
    for sec in sorted(by_sec):
        lines.append(f"## {sec}")
        lines.append("")
        lines.append("| key | oracle | what it does |")
        lines.append("|---|---|---|")
        for k, s in sorted(by_sec[sec]):
            kind = "hash" if s.oracle is not None else "rows-only"
            fn = getattr(s.fn, "__wrapped__", s.fn)
            desc = first_sentence(fn.__doc__).replace("|", "\\|")
            lines.append(f"| `{k}` | {kind} | {desc} |")
        lines.append("")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "CATALOG.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")

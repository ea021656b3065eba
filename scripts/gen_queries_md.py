"""Regenerate QUERIES.md from __ray_entry__.queries()/oracle_sql().

Check class comes from oracle_sql membership; the description is the first
sentence(s) of the query callable's docstring (truncated).  Run after adding
or renaming a query:

    python scripts/gen_queries_md.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

HEADER = """# Query catalog

Every `queries()` entry in `__ray_entry__.py`, its correctness check class, and what it computes.
`SQL oracle` = the driver runs the Ray pipeline and the DuckDB `oracle_sql()` side by side and
compares row count, schema, and a value hash.  `rows-only` = approximate / model-based /
stub-backed by design; accuracy is gated in pytest instead (see each docstring).

| # | query | check | what it computes |
|---|---|---|---|
"""


def describe(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    flat = " ".join(line.strip() for line in doc.splitlines())
    # hard cap ~180 chars, truncating at a word boundary so no dangling
    # mid-word or mid-``code`` fragments land in the table
    if len(flat) > 180:
        flat = flat[:177].rsplit(" ", 1)[0].rstrip("`,;:") + "..."
    return flat.replace("|", "\\|")


def main() -> None:
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    rows = []
    for i, name in enumerate(sorted(qs), 1):
        check = "SQL oracle" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {check} | {describe(qs[name])} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out}: {len(rows)} queries ({len(oracles & set(qs))} SQL-backed)")


if __name__ == "__main__":
    main()

"""Generate the registry crosswalk table in docs/COVERAGE.md (VERDICT r9
item 8): the full query inventory — name, what SURVEY §2 row it
certifies, oracle-backed or rows-only, tags — rendered straight from
``queries.registry.REGISTRY`` and injected between the BEGIN/END
markers, so the document cannot drift from the code. The hand-written
sections around it stay hand-written; only the marked block is owned by
this tool.

Usage:
    python tools/gen_coverage.py           # rewrite the block in place
    python tools/gen_coverage.py --check   # exit 1 if the block is stale
                                           # (tests/test_registry.py runs this)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN GENERATED registry-crosswalk (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED registry-crosswalk -->"
DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "COVERAGE.md")


def render() -> str:
    from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
    import pipeline_etl_website_visits_spark.queries  # noqa: F401 - registry fill

    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    lines = [
        BEGIN,
        "",
        f"{len(REGISTRY)} registered queries ({n_oracle} oracle-backed, "
        f"{len(REGISTRY) - n_oracle} rows-only by design). Source of truth: "
        "`queries.registry.REGISTRY` — this table is generated; edit the "
        "`certifies=`/`tags=` arguments in the `@query` decorators, then "
        "rerun `python tools/gen_coverage.py`.",
        "",
        "| Query | Certifies (SURVEY §2) | Oracle | Tags |",
        "|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        cert = (q.certifies or "").replace("|", "\\|")
        oracle = "sql" if q.oracle is not None else "rows-only"
        tags = ", ".join(q.tags)
        lines.append(f"| {name} | {cert} | {oracle} | {tags} |")
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    check = "--check" in sys.argv
    with open(DOC) as f:
        doc = f.read()
    if BEGIN not in doc or END not in doc:
        raise SystemExit(f"markers not found in {DOC}")
    head, rest = doc.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    new = head + render() + tail
    if check:
        if new != doc:
            print("COVERAGE.md registry crosswalk is STALE — "
                  "run: python tools/gen_coverage.py")
            return 1
        print("COVERAGE.md registry crosswalk is up to date")
        return 0
    if new != doc:
        with open(DOC, "w") as f:
            f.write(new)
        print(f"rewrote crosswalk block in {DOC}")
    else:
        print("crosswalk already up to date")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

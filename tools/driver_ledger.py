"""Driver-window exhaustion ledger.

Prints a markdown summary of which registry keys have ever appeared in a
committed ``CORRECTNESS_r*.json`` (the external driver's per-round gate),
which rounds checked them, and which keys the NEXT driver window (the
first 50 of ``queries()``, ordered by ``plans/registry._surface_order``)
will check.  Paste the output into COVERAGE.md at round close.

Usage:  python tools/driver_ledger.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flink_big_query_connector_spark.plans import registry  # noqa: E402


def main() -> None:
    last = registry._driver_checked_rounds()
    # rounds per key (re-walk the files for the full history)
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    rounds_of: dict[str, list[int]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(path.read_text())
        for key in data:
            rounds_of.setdefault(key, []).append(rnd)

    order = registry._surface_order()
    window = set(order[:50])
    names = sorted(registry.REGISTRY)
    never = [n for n in names if n not in last]
    failed = [n for n in names if n in last and not last[n][1]]
    print(
        f"Registry keys: {len(names)}.  Ever driver-checked: "
        f"{len(names) - len(never)}.  Never: {len(never)}.  "
        f"Latest-row-failed: {len(failed)}.  "
        f"Next window (first 50 of queries()): "
        f"{sum(1 for n in window if n in failed)} failed-tier + "
        f"{sum(1 for n in window if n not in last)} never-checked + "
        f"{sum(1 for n in window if n in last and n not in failed)} "
        f"LRU keys."
    )
    print()
    print("| registry key | driver rounds | next window |")
    print("|---|---|---|")
    for n in names:
        rs = ",".join(f"r{r}" for r in sorted(set(rounds_of.get(n, [])))) or "—"
        print(f"| `{n}` | {rs} | {'yes' if n in window else ''} |")


if __name__ == "__main__":
    main()

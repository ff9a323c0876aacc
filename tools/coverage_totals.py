"""Emit COVERAGE.md's header totals from the live registries — counts
come from CALLING queries()/oracle_sql() plus `pytest --collect-only`,
so the header cannot drift from the code (VERDICT-r4 ask #9).

Usage:
    python tools/coverage_totals.py            # print the totals line
    python tools/coverage_totals.py --update   # rewrite the COVERAGE.md
                                               # totals sentence in place
"""

from __future__ import annotations

import re
import subprocess
import sys


def totals() -> dict:
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    missing = sorted(set(os_) - set(qs))
    assert not missing, f"oracle without queries entry: {missing}"
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    m = re.search(r"(\d+) tests collected", p.stdout)
    return {
        "queries": len(qs),
        "oracles": len(os_),
        "tests": int(m.group(1)) if m else -1,
    }


def main() -> None:
    t = totals()
    line = (
        f"**{t['queries']} `queries()` entries / {t['oracles']} "
        f"`oracle_sql()` oracles / {t['tests']} pytest tests collected**"
    )
    print(line)
    if "--update" in sys.argv:
        path = "/root/repo/COVERAGE.md"
        src = open(path).read()
        new, n = re.subn(
            r"\*\*\d+ `queries\(\)` entries / \d+\s+`oracle_sql\(\)`\s+"
            r"oracles / \d+ pytest tests collected\*\*",
            line, src, count=1,
        )
        assert n == 1, "totals sentence not found in COVERAGE.md"
        open(path, "w").write(new)
        print("COVERAGE.md updated")


if __name__ == "__main__":
    main()

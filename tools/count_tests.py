"""Stamp the README's test count from pytest's OWN collection — the
count is generated, never hand-maintained (VERDICT r11 #6: the
hand-edited number was stale two rounds running).

Usage: python tools/count_tests.py [--check]

Runs ``pytest --collect-only -q tests/`` and rewrites the single
``NNN collected tests`` token in README.md. ``--check`` exits non-zero
instead of writing when the stamped number no longer matches (CI /
pre-commit shape).
"""

from __future__ import annotations

import re
import subprocess
import sys

README = "README.md"
TOKEN = re.compile(r"\b\d+ collected tests\b")


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        capture_output=True, text=True,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise SystemExit(
            f"could not parse pytest collection output:\n{out.stdout[-2000:]}"
        )
    return int(m.group(1))


def main() -> int:
    check = "--check" in sys.argv[1:]
    n = collected_count()
    with open(README) as fh:
        text = fh.read()
    hits = TOKEN.findall(text)
    if len(hits) != 1:
        raise SystemExit(
            f"README.md must contain exactly one 'NNN collected tests' "
            f"token, found {len(hits)}"
        )
    want = f"{n} collected tests"
    if hits[0] == want:
        print(f"README test count up to date: {want}")
        return 0
    if check:
        print(f"STALE: README says {hits[0]!r}, collection says {want!r}")
        return 1
    with open(README, "w") as fh:
        fh.write(TOKEN.sub(want, text))
    print(f"stamped: {hits[0]!r} -> {want!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

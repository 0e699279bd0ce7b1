"""Standing per-round correctness gate: the full oracle sweep at all
three generated scales in one command, with a dated summary line ready
for COVERAGE.md.

Usage: python tools/sweep_correctness.py [sf_dir ...]
       (default: /root/testdata/sf0.001 sf0.01 sf0.1)

Why three scales: the r6 sf0.1 sweep caught two real cross-engine
precision edges (q62 session gap, q130 avg rounding) that sf0.01
missed; sf0.001 catches empty-group/edge-cardinality bugs the bigger
scales mask. Runs tools/check_correctness.py per scale in a fresh
process (one Spark session each, isolating cache state), prints each
scale's tail, and exits non-zero if any scale fails.
"""

from __future__ import annotations

import datetime
import re
import subprocess
import sys

DEFAULT_SCALES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    scales = sys.argv[1:] or DEFAULT_SCALES
    results = []
    failed = False
    for sf_dir in scales:
        proc = subprocess.run(
            [sys.executable, "tools/check_correctness.py", sf_dir],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        out = proc.stdout.strip().splitlines()
        tail = out[-1] if out else "(no output)"
        m = re.search(
            r"(\d+) pass, (\d+) fail(?:, (\d+) rows-only)?", tail
        )
        if not m or int(m.group(2)) or proc.returncode:
            failed = True
            print(f"== {sf_dir}: FAIL ==")
            for line in out:
                if line.startswith(("FAIL", "ERR")) or "fail" in line:
                    print("  " + line)
            if proc.stderr and not m:
                print(proc.stderr[-2000:])
            results.append(f"{sf_dir.rsplit('/', 1)[-1]} FAIL")
        else:
            summary = (
                f"{m.group(1)} pass"
                + (f", {m.group(3)} rows-only" if m.group(3) else "")
            )
            print(f"== {sf_dir}: {summary} ==")
            results.append(f"{sf_dir.rsplit('/', 1)[-1]} {summary}")
    today = datetime.date.today().isoformat()
    print(
        f"COVERAGE.md line: - {today} 3-scale oracle sweep: "
        + "; ".join(results)
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

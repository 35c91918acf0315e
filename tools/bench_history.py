"""Round-over-round bench deltas: compare the latest two BENCH_r{N}.json
(driver-recorded) or any two bench JSON files, flag per-query regressions.

Usage:
    python tools/bench_history.py                # auto-find BENCH_r*.json
    python tools/bench_history.py old.json new.json
    python bench.py 2>/dev/null > /tmp/now.json && \
        python tools/bench_history.py BENCH_r1.json /tmp/now.json

Exit code 1 if any query regressed more than REGRESSION_PCT (and more
than ABS_FLOOR_SEC absolute — sub-second noise is not a regression).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REGRESSION_PCT = 0.30
ABS_FLOOR_SEC = 0.5


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _auto_pair() -> tuple[str, str] | None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(root, "BENCH_r*.json"))
    def rnd(p):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        return int(m.group(1)) if m else -1
    files = sorted((f for f in files if rnd(f) >= 0), key=rnd)
    if len(files) < 2:
        return None
    return files[-2], files[-1]


def main() -> int:
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        pair = _auto_pair()
        if pair is None:
            print("need two BENCH_r*.json (or pass two paths); nothing to compare")
            return 0
        old_p, new_p = pair

    old, new = _load(old_p), _load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"comparing {os.path.basename(old_p)} -> {os.path.basename(new_p)}")
    print(f"total: {old.get('value')}s -> {new.get('value')}s")

    regressed = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            print(f"  + {name}: new query ({b}s)")
            continue
        if b is None:
            print(f"  - {name}: removed")
            continue
        delta = b - a
        pct = delta / a if a else 0.0
        flag = ""
        if delta > ABS_FLOOR_SEC and pct > REGRESSION_PCT:
            flag = "  << REGRESSION"
            regressed.append(name)
        if abs(pct) > 0.10:
            print(f"  {name}: {a:.2f}s -> {b:.2f}s ({pct:+.0%}){flag}")

    if regressed:
        print(f"\n{len(regressed)} regressed: {', '.join(regressed)}")
        return 1
    print("\nno regressions past threshold "
          f"(>{REGRESSION_PCT:.0%} and >{ABS_FLOOR_SEC}s)")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:   # piped into head — not an error
        sys.exit(0)

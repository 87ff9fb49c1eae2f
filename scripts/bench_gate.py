"""Perf regression gate over bench_history.jsonl (VERDICT r3 item 7).

Compares the newest bench record against the previous comparable run
(same scene kind + ray batch + device class) and exits 1 when the
headline or the pinned atrium continuity metric dropped more than
THRESHOLD (default 10%). Run after `python bench.py`:

    python bench.py && python scripts/bench_gate.py

No history / single record = pass (nothing to compare)."""
from __future__ import annotations

import json
import os
import sys

THRESHOLD = float(os.environ.get("BENCH_GATE_THRESHOLD", "0.10"))
HIST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_history.jsonl")


def load_history(path=HIST):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def comparable(a, b):
    return (a.get("scene") == b.get("scene")
            and a.get("rays") == b.get("rays")
            and a.get("device") == b.get("device"))


def check(history, threshold=THRESHOLD):
    """Returns (ok, message)."""
    if len(history) < 2:
        return True, "no prior comparable run"
    cur = history[-1]
    prev = next((h for h in reversed(history[:-1]) if comparable(h, cur)),
                None)
    if prev is None:
        return True, "no prior comparable run"
    msgs = []
    ok = True
    for key in ("headline_mrays", "atrium_mrays"):
        c, p = cur.get(key), prev.get(key)
        if c is None or p is None or p <= 0:
            continue
        ratio = c / p
        msgs.append(f"{key}: {p} -> {c} ({ratio:.2%})")
        if ratio < 1.0 - threshold:
            ok = False
    return ok, "; ".join(msgs)


def main():
    ok, msg = check(load_history())
    print(("PASS" if ok else "REGRESSION") + ": " + msg)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

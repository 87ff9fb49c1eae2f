"""Cascade-knob sweep on the bench mix at the k6 default (round-5
ROADMAP item 3): chunk size x stage count x stage floor, each config in
a fresh subprocess (the knobs are import-time env vars).

Usage: PYTHONPATH=/root/repo python scripts/tune_cascade5.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("base_64k_s8_f512", dict()),
    ("s6", dict(TT_CASCADE_STAGES="6")),
    ("f2048", dict(TT_CASCADE_FLOOR="2048")),
    ("s12_f128", dict(TT_CASCADE_STAGES="12", TT_CASCADE_FLOOR="128")),
    ("chunk32k", dict(TT_CHUNK_RAYS="32768")),
    ("chunk128k", dict(TT_CHUNK_RAYS="131072")),
]


def main():
    out = {}
    for name, env in CONFIGS:
        e = dict(os.environ)
        e.update(env)
        e["PYTHONPATH"] = REPO + ":" + e.get("PYTHONPATH", "")
        r = subprocess.run([sys.executable, "-u",
                            os.path.join(REPO, "bench.py")],
                           env=e, capture_output=True, text=True,
                           timeout=3600)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        if line:
            d = json.loads(line[-1])
            out[name] = {"mrays": d["value"],
                         "atrium": d["detail"].get("atrium_mrays")}
        else:
            out[name] = {"error": r.stdout[-400:] + r.stderr[-400:]}
        print(name, out[name], flush=True)
    print(json.dumps(out), flush=True)
    with open("/tmp/cascade5.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()

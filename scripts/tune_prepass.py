"""A/B the top-level prepass (TT_TOP_PREPASS) on the bench ray mix.

Runs bench.py (atrium-only, no history logging) in fresh subprocesses
with the flag off/on and prints both. Chip-serialized by construction."""
from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(flag: str):
    env = dict(os.environ, TT_TOP_PREPASS=flag, BENCH_NO_LOG="1",
               BENCH_SCENE=os.environ.get("TP_SCENE", "atrium"))
    if os.environ.get("TP_RAYS"):
        env["BENCH_RAYS"] = os.environ["TP_RAYS"]
    if os.environ.get("TP_LEAF_K"):
        env["BENCH_LEAF_K"] = os.environ["TP_LEAF_K"]
    r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=5000)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not line:
        return {"error": r.stderr[-500:]}
    return json.loads(line[-1])


def main():
    for flag in ("0", "1"):
        out = run(flag)
        print(f"TT_TOP_PREPASS={flag}: "
              f"{out.get('value')} Mrays/s "
              f"(atrium {out.get('detail', {}).get('atrium_mrays')})",
              flush=True)


if __name__ == "__main__":
    main()

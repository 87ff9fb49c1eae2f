"""Perf regression gate logic (scripts/bench_gate.py; VERDICT r3 item 7)."""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_gate", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "bench_gate.py"))
bench_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_gate)


def _rec(mrays, atrium=None, scene="both", rays=65536, dev="v5e"):
    return {"headline_mrays": mrays, "atrium_mrays": atrium,
            "scene": scene, "rays": rays, "device": dev}


def test_empty_and_single_pass():
    assert bench_gate.check([])[0]
    assert bench_gate.check([_rec(4.0)])[0]


def test_within_threshold_passes():
    ok, msg = bench_gate.check([_rec(4.0, 4.1), _rec(3.7, 3.8)])
    assert ok, msg


def test_regression_fails():
    ok, msg = bench_gate.check([_rec(4.0, 4.1), _rec(3.5, 4.1)])
    assert not ok, msg
    # atrium regression alone also trips
    ok, _ = bench_gate.check([_rec(4.0, 4.1), _rec(4.0, 3.5)])
    assert not ok


def test_incomparable_runs_skipped():
    # different ray batch: not comparable, pass
    ok, _ = bench_gate.check([_rec(8.0, rays=1024), _rec(3.5)])
    assert ok
    # but the gate finds the LAST comparable run, skipping others
    ok, _ = bench_gate.check([_rec(4.0), _rec(8.0, rays=1024), _rec(3.5)])
    assert not ok


def test_improvement_passes():
    ok, _ = bench_gate.check([_rec(4.0, 4.0), _rec(5.5, 5.0)])
    assert ok

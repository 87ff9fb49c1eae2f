"""Profiling + render metrics (SURVEY.md sections 5.1 / 5.5).

The reference times every pass with CommandBuffer samples
(RayTracingMaster.cs:914-1182) and logs build stats via Debug.Log; the TPU
equivalents here are `jax.profiler` trace annotations (viewable in
TensorBoard / Perfetto), a wall-clock pass timer that respects async
dispatch (block_until_ready fences), and a structured metrics record
(Mrays/s, rays-alive per bounce, cache hit rate, reservoir M stats)
emitted as JSON lines.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region for jax.profiler traces (shows as a track slice)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class PassTimer:
    """Wall-clock pass timing with device fencing.

    with timer.time("trace"): h = traverse(...); timer.fence(h)
    """
    times: Dict[str, List[float]] = field(default_factory=dict)
    _t0: float = 0.0
    _name: str = ""

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.times.setdefault(name, []).append(dt)

    def fence(self, x: Any) -> Any:
        jax.block_until_ready(x)
        return x

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items() if v}


@dataclass
class RenderMetrics:
    """Structured per-frame metrics, dumped as JSON lines."""
    frames: List[Dict[str, Any]] = field(default_factory=list)

    def record(self, frame: int, wall_s: float,
               n_trace: float = 0.0, n_shadow: float = 0.0,
               cache_hits: Optional[float] = None,
               reservoir_m_mean: Optional[float] = None,
               extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        total = n_trace + n_shadow
        rec = {
            "frame": frame,
            "wall_s": round(wall_s, 5),
            "rays_traced": float(total),
            "mrays_per_s": round(total / wall_s / 1e6, 4) if wall_s > 0
            else 0.0,
            "n_closest": float(n_trace),
            "n_shadow": float(n_shadow),
        }
        if cache_hits is not None:
            rec["cache_hit_rate"] = float(cache_hits)
        if reservoir_m_mean is not None:
            rec["reservoir_m_mean"] = float(reservoir_m_mean)
        if extra:
            rec.update(extra)
        self.frames.append(rec)
        return rec

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.frames:
                f.write(json.dumps(rec) + "\n")

    def summary(self) -> Dict[str, float]:
        if not self.frames:
            return {}
        ms = [r["mrays_per_s"] for r in self.frames]
        return {"frames": len(self.frames),
                "mrays_per_s_mean": sum(ms) / len(ms),
                "mrays_per_s_max": max(ms)}

"""SHaRC-style world-space radiance cache: multi-level voxel hash grid.

Counterpart of the reference's radiance cache (CommonData.cginc:1490-1800:
multi-level voxel hash `ComputeHash`/`CompressHash` :1509-1530, insert/find
:1661-1700, path-propagated `AddHitToCache` :1718, decay/compaction
`CacheResolve` RayGenKernels.compute:273-358; buffers
RayTracingMaster.cs:794-806). TPU redesign:

* No atomics/locks: per-frame insertions are batched from the wavefront and
  applied with one `scatter-add` (the reference's InterlockedAdd loop
  becomes a single XLA scatter); collisions on the same slot accumulate,
  which is exactly the desired behavior.
* Fixed-capacity open hash with BOUNDED LINEAR PROBING (N_PROBES slots,
  like the reference's bounded insert loop, CommonData.cginc:1661-1700):
  an insert takes the first probe that matches its key, else the first
  empty, else the first stale resident (age-based eviction); only when
  all probes hold fresh foreign entries is the insert dropped. This
  bounds thrash at realistic occupancy (tested under contention).
* Voxel level grows with distance from the camera (log2 scaling), so the
  cache is perspectively allocated like SHaRC.

API is pure-functional: (cache, records) -> cache.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

U32 = jnp.uint32

BASE_CELL = 0.02          # meters at reference distance
LEVEL_DIST = 2.0          # distance at which level 0 ends
CONFIDENT_COUNT = 8.0     # min accumulated samples before a query hits
MAX_AGE = 60.0            # frames before an entry may be evicted


class RadianceCache(NamedTuple):
    key: jnp.ndarray     # [C] uint32 tag (0 = empty)
    rad: jnp.ndarray     # [C,3] accumulated radiance * count
    count: jnp.ndarray   # [C]
    age: jnp.ndarray     # [C] frames since last touch
    # packed cell identity (grid coords + level + normal octant, see
    # _pack_cell) — lets cache_resolve reproject entries across camera
    # motion like the reference's 2-word HashKeyValue
    # (CommonData.cginc:1509-1530 CompressHash)
    cellw0: jnp.ndarray  # [C] uint32
    cellw1: jnp.ndarray  # [C] uint32

    @staticmethod
    def create(capacity: int = 1 << 20) -> "RadianceCache":
        return RadianceCache(key=jnp.zeros((capacity,), U32),
                             rad=jnp.zeros((capacity, 3), jnp.float32),
                             count=jnp.zeros((capacity,), jnp.float32),
                             age=jnp.zeros((capacity,), jnp.float32),
                             cellw0=jnp.zeros((capacity,), U32),
                             cellw1=jnp.zeros((capacity,), U32))

    @property
    def capacity(self) -> int:
        return self.key.shape[0]


def _hash_u32(x):
    x = x.astype(U32)
    x = x ^ (x >> 16)
    x = x * U32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * U32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _level_of(d):
    return jnp.clip(jnp.floor(jnp.log2(jnp.maximum(d / LEVEL_DIST, 1.0))),
                    0, 12).astype(jnp.int32)


def _cell_hash(c, level, oct_n):
    h = _hash_u32(c[..., 0].astype(U32)
                  ^ (_hash_u32(c[..., 1].astype(U32)) << 1)
                  ^ (_hash_u32(c[..., 2].astype(U32)) << 2)
                  ^ (level.astype(U32) << 27) ^ (oct_n.astype(U32) << 23))
    return h, h | U32(1)      # key never 0 (0 = empty slot)


def _pack_cell(c, level, oct_n):
    """Pack grid coords (signed 17 bits/axis) + level (10) + octant (3)
    into two u32 words — the reference's CompressHash layout
    (CommonData.cginc:1509-1530)."""
    m17 = U32((1 << 17) - 1)
    cx = c[..., 0].astype(U32) & m17
    cy = c[..., 1].astype(U32) & m17
    cz = c[..., 2].astype(U32) & m17
    w0 = cx | (cy << 17)                       # y low 15 bits in w0[17:32]
    w1 = ((cy >> 15) | (cz << 2) | (level.astype(U32) << 19)
          | (oct_n.astype(U32) << 29))
    return w0, w1


def _unpack_cell(w0, w1):
    neg = jnp.int32(1 << 16)
    m17 = U32((1 << 17) - 1)
    cx = (w0 & m17).astype(jnp.int32)
    cy = (((w1 << 15) | (w0 >> 17)) & m17).astype(jnp.int32)
    cz = ((w1 >> 2) & m17).astype(jnp.int32)
    sext = lambda v: jnp.where((v & neg) != 0, v | jnp.int32(~((1 << 17) - 1)),
                               v)
    c = jnp.stack([sext(cx), sext(cy), sext(cz)], axis=-1)
    level = ((w1 >> 19) & U32(0x3FF)).astype(jnp.int32)
    oct_n = (w1 >> 29).astype(jnp.int32)
    return c, level, oct_n


def cache_cell(pos, normal, cam_pos):
    """(slot hash, key tag) for a shading point. Level = log2 of camera
    distance (SHaRC's perspective voxel sizing); key folds in the cell
    coords, level and the normal octant."""
    h, key, _, _ = cache_cell_packed(pos, normal, cam_pos)
    return h, key


def cache_cell_packed(pos, normal, cam_pos):
    """(slot hash, key tag, packed cell w0, w1) — the packed words are
    stored per entry so cache_resolve can reproject across camera moves."""
    d = jnp.linalg.norm(pos - cam_pos, axis=-1)
    level = _level_of(d)
    cell_size = BASE_CELL * jnp.exp2(level.astype(jnp.float32))
    c = jnp.floor(pos / cell_size[..., None]).astype(jnp.int32)
    oct_n = ((normal[..., 0] > 0).astype(jnp.int32)
             | ((normal[..., 1] > 0).astype(jnp.int32) << 1)
             | ((normal[..., 2] > 0).astype(jnp.int32) << 2))
    h, key = _cell_hash(c, level, oct_n)
    w0, w1 = _pack_cell(c, level, oct_n)
    return h, key, w0, w1


N_PROBES = 4


def _probe_slots(capacity: int, slot_hash):
    base = (slot_hash % U32(capacity)).astype(jnp.int32)
    return jnp.stack([(base + k) % capacity for k in range(N_PROBES)],
                     axis=-1)                        # [N,P]


def cache_update(cache: RadianceCache, slot_hash, key, radiance, weight,
                 w0=None, w1=None):
    """Batch insert: radiance [N,3], weight [N] (0 = skip). One scatter-add
    per array. Probe order per record: key match > empty > stale resident
    > drop (bounded linear probing).

    Keep N bounded (~one record per pixel): row scatter costs ~28 ns per
    ISSUED row on TPU, and the segmented-coalescing alternative (sort by
    slot + cumsum run totals) was measured WORSE — argsort/cumsum/cummax
    at 2M rows cost 300-400 ms on v5e. Callers with per-bounce records
    should insert a rotating SUBSET per frame instead
    (render_sample_cached) — the cache accumulates across frames, exactly
    like the reference's per-frame bounded insert loop
    (CommonData.cginc:1661-1700)."""
    C = cache.capacity
    slots = _probe_slots(C, slot_hash)               # [N,P]
    live = weight > 0.0

    resident = cache.key[slots]                      # [N,P]
    is_match = resident == key[:, None]
    is_empty = resident == 0
    is_stale = cache.age[slots] > MAX_AGE
    # priority score: matches (0) before empties (1) before stale (2);
    # ties broken by probe order
    score = (jnp.where(is_match, 0, jnp.where(is_empty, 1,
             jnp.where(is_stale, 2, 3))) * N_PROBES
             + jnp.arange(N_PROBES, dtype=jnp.int32)[None, :])
    pick = jnp.argmin(score, axis=-1)                # [N]
    n = jnp.arange(slots.shape[0])
    slot = slots[n, pick]
    picked_score = score[n, pick] // N_PROBES
    match = picked_score == 0
    claim = live & (picked_score > 0) & (picked_score < 3)
    use = live & (match | claim)

    # claimed slots are reset before accumulation
    claim_idx = jnp.where(claim, slot, C)           # out-of-range = dropped
    reset = jnp.zeros_like(cache.count).at[claim_idx].add(
        1.0, mode="drop") > 0
    count = jnp.where(reset, 0.0, cache.count)
    rad = jnp.where(reset[:, None], 0.0, cache.rad)

    idx = jnp.where(use, slot, C)
    rad = rad.at[idx].add(radiance * weight[..., None], mode="drop")
    count = count.at[idx].add(weight, mode="drop")
    touched = jnp.zeros_like(count).at[idx].add(1.0, mode="drop") > 0
    keyarr = cache.key.at[idx].set(key, mode="drop")
    age = jnp.where(touched, 0.0, cache.age)
    if w0 is None:
        cw0, cw1 = cache.cellw0, cache.cellw1
    else:
        cw0 = cache.cellw0.at[idx].set(w0, mode="drop")
        cw1 = cache.cellw1.at[idx].set(w1, mode="drop")
    return RadianceCache(key=keyarr, rad=rad, count=count, age=age,
                         cellw0=cw0, cellw1=cw1)


def cache_query(cache: RadianceCache, pos, normal, cam_pos):
    """Returns (radiance [N,3], hit [N]). Probes the same N_PROBES slots
    as cache_update and takes the first confident key match."""
    h, key = cache_cell(pos, normal, cam_pos)
    slots = _probe_slots(cache.capacity, h)          # [N,P]
    ok_p = (cache.key[slots] == key[..., None]) \
        & (cache.count[slots] >= CONFIDENT_COUNT)    # [N,P]
    pick = jnp.argmax(ok_p, axis=-1)
    n = jnp.arange(slots.shape[0])
    slot = slots[n, pick]
    ok = ok_p[n, pick]
    rad = cache.rad[slot] / jnp.maximum(cache.count[slot], 1e-6)[..., None]
    return jnp.where(ok[..., None], rad, 0.0), ok


def cache_resolve(cache: RadianceCache, decay: float = 0.98,
                  count_cap: float = 256.0, cam_pos=None,
                  prev_cam_pos=None) -> RadianceCache:
    """Per-frame maintenance (reference CacheResolve,
    RayGenKernels.compute:273-358): age entries, decay accumulators so
    the cache tracks dynamic lighting, cap counts.

    When cam_pos/prev_cam_pos are given AND differ, additionally runs the
    camera-motion REPROJECTION merge (reference GetReprojectedHash,
    CommonData.cginc:1764 + the sidelined-voxel pull,
    RayGenKernels.compute:290-300): every young entry whose cell had a
    DIFFERENT distance level under the previous camera inherits the
    accumulated (radiance, count) of that previous-level entry, so
    confidence survives the level churn instead of cold-starting. Pure
    vectorized gather-merge over the table — callers should skip the
    cam args when the camera did not move (saves the pass)."""
    scale = jnp.where(cache.count > count_cap,
                      count_cap / jnp.maximum(cache.count, 1e-6), 1.0)
    scale = scale * decay
    rad = cache.rad * scale[:, None]
    count = cache.count * scale
    if cam_pos is not None and prev_cam_pos is not None:
        c, level, oct_n = _unpack_cell(cache.cellw0, cache.cellw1)
        cell_size = BASE_CELL * jnp.exp2(level.astype(jnp.float32))
        center = (c.astype(jnp.float32) + 0.5) * cell_size[:, None]
        lev_prev = _level_of(jnp.linalg.norm(
            center - jnp.asarray(prev_cam_pos, jnp.float32), axis=-1))
        occupied = cache.key != 0
        # only pull into YOUNG entries (count below confidence x2): they
        # are the cold-started ones, and the gate stops repeated pulls
        # from double-counting a still-live source
        young = occupied & (count < 2.0 * CONFIDENT_COUNT) \
            & (lev_prev != level)
        size_prev = BASE_CELL * jnp.exp2(lev_prev.astype(jnp.float32))
        c_prev = jnp.floor(center / size_prev[:, None]).astype(jnp.int32)
        h_src, key_src = _cell_hash(c_prev, lev_prev, oct_n)
        slots = _probe_slots(cache.capacity, h_src)          # [C,P]
        ok_p = (cache.key[slots] == key_src[:, None]) \
            & (cache.count[slots] >= CONFIDENT_COUNT)
        pick = jnp.argmax(ok_p, axis=-1)
        nn = jnp.arange(slots.shape[0])
        src = slots[nn, pick]
        pull = young & ok_p[nn, pick] & (src != nn)
        rad = rad + jnp.where(pull[:, None], rad[src], 0.0)
        count = count + jnp.where(pull, count[src], 0.0)
    return RadianceCache(key=cache.key, rad=rad, count=count,
                         age=cache.age + 1.0,
                         cellw0=cache.cellw0, cellw1=cache.cellw1)


def render_sample_cached(scene, cam, cfg, cache: RadianceCache, pixel,
                         sample_id, di_sample=None, jitter=None):
    """One wavefront sample that both queries and feeds the cache.

    Returns (radiance [R,3], stats, new_cache). cfg must have
    cache_capture=True (and usually cache_query_bounce >= 1)."""
    from truetrace_tpu.integrate.pathtrace import render_sample_with_stats
    radiance, st = render_sample_with_stats(scene, cam, cfg, pixel,
                                            sample_id, cache=cache,
                                            di_sample=di_sample,
                                            jitter=jitter)
    # per-bounce outgoing-radiance estimates: everything accumulated after
    # entering the vertex, un-scaled by the path throughput at entry
    total = radiance[:, None, :]                      # [R,1,3]
    L = (total - st["cache_prefix"]) / jnp.maximum(st["cache_tp"], 1e-6)
    live = st["cache_live"]
    # STOCHASTIC ROTATION: insert only ONE bounce level per frame
    # (sample_id % B), so scatter traffic stays at one row per pixel.
    # The cache is a cross-frame accumulator — every level lands every B
    # frames, matching the reference's bounded per-frame insert budget
    # (CommonData.cginc:1661-1700). Inserting all R*B records per frame
    # was measured at +600 ms (scatter rows) and coalescing them first
    # at +400 ms (argsort/cumsum at 2M rows) — BASELINE.md round 2.
    B = L.shape[1]
    pick_b = (jnp.asarray(sample_id, jnp.uint32) % B).astype(jnp.int32)
    sel = lambda a: jax.lax.dynamic_index_in_dim(a, pick_b, axis=1,
                                                 keepdims=False)
    w0, w1 = sel(st["cache_w0"]), sel(st["cache_w1"])
    h, key = _cell_hash(*_unpack_cell(w0, w1))
    cache = cache_update(cache, h, key, jnp.clip(sel(L), 0.0, 1e4),
                         sel(live).astype(jnp.float32), w0=w0, w1=w1)
    return radiance, st, cache

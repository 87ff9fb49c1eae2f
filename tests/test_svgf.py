"""SVGF denoiser: noise reduction, edge preservation, temporal behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.post.svgf import SVGFState, svgf_denoise


def _synthetic(seed=0, h=48, w=48, noise=0.3):
    """Two flat regions with different albedo/depth + noisy irradiance."""
    r = np.random.default_rng(seed)
    albedo = np.full((h, w, 3), 0.6, np.float32)
    albedo[:, w // 2:] = 0.3
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    normal[:, w // 2:, 2] = 0.0
    normal[:, w // 2:, 0] = 1.0
    depth = np.full((h, w), 2.0, np.float32)
    depth[:, w // 2:] = 5.0
    clean_irr = np.full((h, w, 3), 1.0, np.float32)
    clean_irr[:, w // 2:] = 0.2
    noisy_irr = clean_irr * (1.0 + noise * r.normal(size=(h, w, 3))
                             ).astype(np.float32)
    noisy_irr = np.maximum(noisy_irr, 0.0)
    return (jnp.asarray(noisy_irr * albedo), jnp.asarray(albedo),
            jnp.asarray(normal), jnp.asarray(depth),
            jnp.asarray(clean_irr * albedo))


def test_noise_reduced_single_frame():
    noisy, albedo, normal, depth, clean = _synthetic()
    state = SVGFState.create(48, 48)
    out, _ = svgf_denoise(noisy, albedo, normal, depth, state)
    out = np.asarray(out)
    err_in = np.mean((np.asarray(noisy) - np.asarray(clean)) ** 2)
    err_out = np.mean((out[4:-4, 4:-4] - np.asarray(clean)[4:-4, 4:-4]) ** 2)
    assert np.isfinite(out).all()
    assert err_out < err_in * 0.2, (err_in, err_out)


def test_edge_preserved():
    """The albedo/normal/depth edge at w/2 must survive filtering."""
    noisy, albedo, normal, depth, clean = _synthetic(noise=0.2)
    state = SVGFState.create(48, 48)
    out, _ = svgf_denoise(noisy, albedo, normal, depth, state)
    out = np.asarray(out)
    left = out[:, :20].mean()
    right = out[:, 28:].mean()
    clean_np = np.asarray(clean)
    assert abs(left - clean_np[:, :20].mean()) < 0.15
    assert abs(right - clean_np[:, 28:].mean()) < 0.05
    assert left > right * 3  # edge contrast retained


def test_temporal_accumulation_improves():
    """Feeding several frames must beat the single-frame result."""
    state = SVGFState.create(48, 48)
    _, albedo, normal, depth, clean = _synthetic()
    outs = []
    for i in range(6):
        noisy, *_ = _synthetic(seed=10 + i)
        out, state = svgf_denoise(noisy, albedo, normal, depth, state)
        outs.append(np.asarray(out))
    err_first = np.mean((outs[0][4:-4, 4:-4]
                         - np.asarray(clean)[4:-4, 4:-4]) ** 2)
    err_last = np.mean((outs[-1][4:-4, 4:-4]
                        - np.asarray(clean)[4:-4, 4:-4]) ** 2)
    assert err_last < err_first
    # history length grew
    assert float(state.hist_len.max()) >= 5.0


def test_history_rejected_on_geometry_change():
    state = SVGFState.create(48, 48)
    noisy, albedo, normal, depth, _ = _synthetic()
    _, state = svgf_denoise(noisy, albedo, normal, depth, state)
    # flip normals: history must be invalidated
    _, state2 = svgf_denoise(noisy, albedo, -normal, depth, state)
    assert float(state2.hist_len.max()) == 1.0


def test_pallas_atrous_matches_xla():
    """kernels/atrous_pallas (interpret mode on CPU) must match the XLA
    reference pass bitwise-close for several step sizes."""
    from truetrace_tpu.kernels.atrous_pallas import atrous_pass_pallas
    from truetrace_tpu.post.svgf import _atrous_pass
    r = np.random.default_rng(9)
    H, W = 40, 72
    color = jnp.asarray(r.uniform(0, 3, (H, W, 3)).astype(np.float32))
    var = jnp.asarray(r.uniform(0, 0.5, (H, W)).astype(np.float32))
    n = r.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal = jnp.asarray(n)
    depth = jnp.asarray(r.uniform(0.5, 10, (H, W)).astype(np.float32))
    for step in (1, 2):
        c1, v1 = _atrous_pass(color, var, normal, depth, step)
        c2, v2 = atrous_pass_pallas(color, var, normal, depth, step)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-4, atol=1e-6)


def test_sparse_radiance_energy_preserved():
    """Sparse-input energy preservation: with mostly-zero per-frame
    radiance (hard indirect lighting — ~40% zero pixels is typical), the
    filter must converge toward the true mean rather than blacken lone
    lit pixels. Regression for the dark-speckle artifact: the firefly
    clamp must act on the temporally INTEGRATED signal, and the variance
    used by the edge-stopping must be 3x3-prefiltered so stable-zero
    pixels can still borrow from lit neighbors (SVGF paper)."""
    H = W = 64
    rng = np.random.default_rng(0)
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 2] = 1.0
    normal = jnp.asarray(normal)
    depth = jnp.full((H, W), 3.0)
    albedo = jnp.full((H, W, 3), 0.7)
    state = SVGFState.create(H, W)
    p_lit = 0.05
    mean_true = 1.0
    for s in range(16):
        hit = (rng.random((H, W)) < p_lit).astype(np.float32)
        noisy = jnp.asarray(
            np.repeat((hit * mean_true / p_lit)[..., None], 3, -1))
        out, state = svgf_denoise(noisy, albedo, normal, depth, state)
    o = np.asarray(out).mean(-1)
    # energy within 40% of truth (the input-clamp bug produced ~0 here)
    assert 0.6 * mean_true < o.mean() < 1.6 * mean_true, o.mean()
    # and no blackened speckles: every pixel within a sane band
    assert o.min() > 0.2 * o.mean(), (o.min(), o.mean())

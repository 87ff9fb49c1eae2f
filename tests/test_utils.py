"""Checkpoint/resume + profiling utilities."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from truetrace_tpu.post.pipeline import Accumulator
from truetrace_tpu.utils.checkpoint import (
    restore_render_state, save_render_state)
from truetrace_tpu.utils.profiling import PassTimer, RenderMetrics


def test_checkpoint_roundtrip():
    acc = Accumulator.create(8, 8).add(jnp.ones((8, 8, 3)))
    state = {"accum": acc, "sample": jnp.int32(42),
             "params": {"base_color": jnp.full((4, 3), 0.5)}}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_render_state(path, state)
        template = {"accum": Accumulator.create(8, 8),
                    "sample": jnp.int32(0),
                    "params": {"base_color": jnp.zeros((4, 3))}}
        back = restore_render_state(path, template)
        assert back is not None
        np.testing.assert_allclose(np.asarray(back["accum"].image),
                                   np.asarray(acc.image))
        assert int(back["sample"]) == 42
        np.testing.assert_allclose(
            np.asarray(back["params"]["base_color"]), 0.5)
        # missing path -> None
        assert restore_render_state(os.path.join(d, "nope"),
                                    template) is None


def test_pass_timer():
    t = PassTimer()
    with t.time("work"):
        x = jnp.arange(1024).sum()
        t.fence(x)
    s = t.summary()
    assert "work" in s and s["work"] > 0


def test_render_metrics():
    m = RenderMetrics()
    m.record(0, 0.5, n_trace=1e6, n_shadow=5e5, cache_hits=0.3,
             reservoir_m_mean=12.0)
    m.record(1, 0.25, n_trace=1e6, n_shadow=5e5)
    s = m.summary()
    assert s["frames"] == 2
    assert abs(m.frames[0]["mrays_per_s"] - 3.0) < 1e-3
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "metrics.jsonl")
        m.dump(p)
        assert len(open(p).read().splitlines()) == 2


def test_materials_json_roundtrip(tmp_path):
    from truetrace_tpu.scene.materials_io import (
        apply_overrides, load_materials, save_materials)
    from truetrace_tpu.scene.mesh import HostMaterial
    mats = [HostMaterial(base_color=(0.2, 0.4, 0.6), roughness=0.3,
                         metallic=1.0),
            HostMaterial(emission=(5.0, 4.0, 3.0))]
    p = str(tmp_path / "mats.json")
    save_materials(p, mats, ["steel", "lamp"])
    back, names = load_materials(p)
    assert names == ["steel", "lamp"]
    assert back[0].base_color == (0.2, 0.4, 0.6)
    assert back[0].metallic == 1.0
    assert back[1].emission == (5.0, 4.0, 3.0)
    edited = apply_overrides(back, names, {"steel": {"roughness": 0.9}})
    assert edited[0].roughness == 0.9 and edited[1].roughness == back[1].roughness

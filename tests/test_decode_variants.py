"""Slab-decode restructure variants (_DECODE_V2, round-5 experiment) stay
bitwise-identical to the v1 baseline.

All variants were measured 3-4x SLOWER on v5e despite fewer VPU ops
(BASELINE.md round-5 decode dead end) — they remain in the code as the
experimental record, and this test pins that every one of them still
computes the exact same traversal (the bitwise-identity argument: for
occupied slots lo <= hi and round-to-nearest mul/sub are monotone, so
min(t0,t1) is the near-bound product exactly).
"""
import importlib

import jax.numpy as jnp
import numpy as np
import pytest

import truetrace_tpu.kernels.cwbvh_wavefront as cw
from tests.test_bvh2 import random_tris
from tests.test_fat_leaves import _build_k, _rays


@pytest.mark.parametrize("variant", [2, 3, 4, 5, 6])
def test_decode_variant_bitwise(variant):
    p0, e1, e2 = random_tris(3000, seed=11)
    nodes, rows, _, stack, _ = _build_k(p0, e1, e2, 3)
    ro, rd = _rays(4096, seed=7)

    def run():
        h = cw._traverse(nodes, rows, ro, rd, jnp.float32(1e30), False,
                         stack)
        a = cw._traverse(nodes, rows, ro, rd, jnp.float32(9.0), True,
                         stack)
        return (np.asarray(h.t), np.asarray(h.tri), np.asarray(h.u),
                np.asarray(h.v), np.asarray(a.tri))

    old = cw._DECODE_V2
    try:
        cw._DECODE_V2 = 0
        base = run()
        cw._DECODE_V2 = variant
        got = run()
    finally:
        cw._DECODE_V2 = old
    for i, (x, y) in enumerate(zip(base, got)):
        assert np.array_equal(x, y), f"variant {variant} output {i}"

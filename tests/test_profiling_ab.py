"""interleaved_ab (utils/profiling.py) — the paired same-session A/B
harness every round-5 perf decision rides on: sanity-check its slope
estimates, pair keys, and significance call on two functions of known
relative cost."""
import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.utils.profiling import interleaved_ab, marginal_slope


def _mk(iters):
    @jax.jit
    def f(x):
        def body(_, v):
            return v * 1.000001 + 1e-7
        return jax.lax.fori_loop(0, iters, body, x)
    return f


def test_interleaved_ab_orders_known_costs():
    x = jnp.ones((256, 256), jnp.float32)
    fast = _mk(50)
    slow = _mk(5000)
    res = interleaved_ab([("fast", fast, (x,)), ("slow", slow, (x,))],
                         rounds=3, n1=1, n2=3, verbose=False)
    assert res["fast"]["median_s"] < res["slow"]["median_s"]
    assert len(res["fast"]["slopes"]) == 3
    pair = res[("pair", "fast", "slow")]
    # fast - slow must be negative; on a 100x cost ratio the paired CI
    # should resolve it
    assert pair["mean_s"] < 0
    assert pair["significant"]


def test_marginal_slope_positive():
    x = jnp.ones((128, 128), jnp.float32)
    s = marginal_slope(_mk(2000), x, n1=1, n2=3)
    assert s > 0

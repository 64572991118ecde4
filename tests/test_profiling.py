"""utils/profiling contract tests (SURVEY §5.1).

``force`` is the repo's only reliable completion barrier on the axon TPU
backend (bare ``block_until_ready`` can return before the execute RPC is
issued — BASELINE.md notes); these tests pin its host-side semantics on the
CPU mesh: it must accept any pytree, fetch without error, and leave values
untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multinn_tpu.utils.profiling import StepTimer, force, timeit


def test_force_accepts_any_pytree():
    force(None)
    force({})
    force(jnp.float32(1.5))
    force((jnp.zeros((3,)), {"a": jnp.ones((100, 7)), "b": [jnp.arange(4)]}))
    # numpy leaves (already on host) pass through
    force({"x": np.ones(5)})


def test_force_does_not_mutate_result():
    out = jax.jit(lambda x: (x @ x, jnp.sum(x)))(jnp.eye(8))
    force(out)
    assert float(out[1]) == 8.0
    np.testing.assert_allclose(np.asarray(out[0]), np.eye(8))


def test_timeit_returns_positive_times():
    r = timeit(jax.jit(lambda x: x @ x), jnp.eye(16), iters=3, warmup=1)
    assert r["iters"] == 3
    assert 0 < r["min_s"] <= r["mean_s"]


def test_step_timer_laps_and_rate():
    t = StepTimer()
    t.start()
    out = jax.jit(lambda x: x * 2.0)(jnp.ones((4,)))
    dt = t.lap(out)
    assert dt > 0
    t.lap(out)
    assert t.mean > 0 and t.rate(10.0) > 0

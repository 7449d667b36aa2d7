"""Elastic execution / failure detection (utils/elastic.py).

The reference has no fault tolerance at all (SURVEY §5); these tests define
the subsystem's contract: a faulted-and-resumed run is bitwise identical to
an uninterrupted one, corruption is detected (not silently propagated), and
an out-of-process resume continues from the latest atomic checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplemath_tpu.utils.elastic import (
    ElasticConfig,
    RestartBudgetExceeded,
    StateCorruption,
    resume_state,
    run_elastic,
    save_state,
)


@jax.jit
def _step(state, i):
    # A deterministic "solver iteration": contraction + step-dependent bias.
    x, c = state
    return 0.9 * x + 0.01 * jnp.float32(i), c + 1


def _init():
    return (jnp.ones((4, 8), jnp.float32), jnp.int32(0))


def _run_plain(n):
    s = _init()
    for i in range(n):
        s = _step(s, i)
    return s


def test_uninterrupted_matches_plain_loop(tmp_path):
    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=4)
    out = run_elastic(lambda s, i: _step(s, i), _init(), 10, cfg)
    ref = _run_plain(10)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    assert int(out[1]) == 10


def test_injected_preemption_resumes_bitwise_identical(tmp_path):
    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=3)
    fired = {"n": 0}

    def fault(step):
        if step == 7 and fired["n"] == 0:
            fired["n"] += 1
            raise RuntimeError("simulated preemption")
        return None

    out = run_elastic(lambda s, i: _step(s, i), _init(), 12, cfg, inject_fault=fault)
    ref = _run_plain(12)
    assert fired["n"] == 1
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))


def test_restart_budget_exceeded(tmp_path):
    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=2, max_restarts=2)

    def always_fault(step):
        if step == 3:
            raise RuntimeError("hard device failure")
        return None

    with pytest.raises(RestartBudgetExceeded):
        run_elastic(lambda s, i: _step(s, i), _init(), 8, cfg, inject_fault=always_fault)
    # The last good checkpoint survives for out-of-process resume.
    resumed = resume_state(str(tmp_path), like=_init())
    assert resumed is not None and resumed[1] == 2


def test_deterministic_corruption_detected(tmp_path):
    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=4)

    def corrupt(step):
        if step == 5:  # every attempt — deterministic divergence
            return lambda s: (s[0] * jnp.nan, s[1])
        return None

    with pytest.raises(StateCorruption):
        run_elastic(lambda s, i: _step(s, i), _init(), 10, cfg, inject_fault=corrupt)


def test_transient_corruption_rolled_back(tmp_path):
    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=4)
    fired = {"n": 0}

    def corrupt_once(step):
        if step == 5 and fired["n"] == 0:
            fired["n"] += 1
            return lambda s: (s[0] + jnp.inf, s[1])
        return None

    out = run_elastic(
        lambda s, i: _step(s, i), _init(), 10, cfg, inject_fault=corrupt_once
    )
    ref = _run_plain(10)
    assert fired["n"] == 1
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))


def test_out_of_process_resume(tmp_path):
    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=5)
    # "Process 1" runs 5 of 20 steps and dies (we just stop).
    run_elastic(lambda s, i: _step(s, i), _init(), 5, cfg)
    # "Process 2" starts over with the same directory — picks up at 5.
    segments = []
    out = run_elastic(
        lambda s, i: _step(s, i),
        _init(),
        20,
        cfg,
        on_segment=lambda step, s: segments.append(step),
    )
    assert segments[0] == 10  # first new segment boundary, not 5
    ref = _run_plain(20)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))


def test_checkpoint_rotation(tmp_path):
    import os

    cfg = ElasticConfig(directory=str(tmp_path), checkpoint_every=2, keep=2)
    run_elastic(lambda s, i: _step(s, i), _init(), 10, cfg)
    dirs = [d for d in os.listdir(tmp_path) if d.startswith("step_")]
    assert len(dirs) == 2
    assert max(dirs) == "step_" + "10".zfill(12)

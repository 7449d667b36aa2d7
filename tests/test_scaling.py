"""Scaling-efficiency harness and multi-process orchestration helpers
(round-1 VERDICT item 6: no untested functions in parallel/multihost.py and
a real weak-scaling measurement path)."""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import pytest

from simplemath_tpu.parallel import multihost
from simplemath_tpu.parallel.scaling import (
    sharding_overhead_report,
    weak_scaling_report,
)


def test_weak_scaling_report_cpu_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    rep = weak_scaling_report(
        per_device_batch=8, horizon=10, iterations=2, device_counts=(1, 2, 4)
    )
    assert rep["device_counts"] == [1, 2, 4]
    for n in (1, 2, 4):
        assert rep["times_s"][n] > 0
        assert rep["efficiency"][n] > 0
    assert rep["efficiency"][1] == pytest.approx(1.0)
    # virtual CPU devices share cores: the report must say so
    assert rep["efficiency_meaningful"] == (jax.default_backend() != "cpu")


def test_sharding_overhead_report():
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 (virtual) devices")
    rep = sharding_overhead_report(
        total_batch=17, horizon=10, iterations=2, n_devices=2
    )
    # 17 rounded down to a multiple of the device count
    assert rep["total_batch"] == 16
    assert rep["n_devices"] == 2
    assert rep["unsharded_s"] > 0 and rep["sharded_s"] > 0
    assert rep["sharded_over_unsharded"] == pytest.approx(
        rep["sharded_s"] / rep["unsharded_s"]
    )


def test_host_local_batch_slice_single_process():
    start, size = multihost.host_local_batch_slice(64)
    assert (start, size) == (0, 64)


def test_host_local_batch_slice_multi_process(monkeypatch):
    monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 2)
    assert multihost.host_local_batch_slice(32) == (16, 8)
    with pytest.raises(ValueError, match="not divisible"):
        multihost.host_local_batch_slice(7)


def test_initialize_from_env_noop_when_unset(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    multihost.initialize_from_env()  # must not raise or initialize anything
    assert jax.process_count() >= 1


_CHILD = textwrap.dedent(
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    from simplemath_tpu.parallel import multihost
    multihost.initialize_from_env()
    start, size = multihost.host_local_batch_slice(8)
    mesh = multihost.pod_mesh()
    print(f"RESULT {jax.process_count()} {start} {size} {mesh.devices.size}")
    """
)


def test_initialize_from_env_two_processes():
    """Two real processes stitched by jax.distributed on the CPU backend:
    initialize_from_env + host_local_batch_slice + pod_mesh end-to-end."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        **os.environ,
        "COORDINATOR_ADDRESS": f"localhost:{port}",
        "NUM_PROCESSES": "2",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD],
            env={**env, "PROCESS_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed init timed out")
        assert p.returncode == 0, f"proc {i} failed:\n{err[-2000:]}"
        outs.append(out)
    results = sorted(
        line.split()[1:] for o in outs for line in o.splitlines()
        if line.startswith("RESULT")
    )
    # process_count=2 everywhere; slices partition [0, 8); pod mesh sees
    # all 4 global devices (2 procs x 2 local).
    assert results == [["2", "0", "4", "4"], ["2", "4", "4", "4"]]

"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): cartpole iLQR solves/s/chip at H=100,
8192 scenarios, 10 iLQR iterations per solve; ``vs_baseline`` is the ratio
to the 10,000 solves/s/chip target.

Secondary metrics (reference README.md:135-155 parity: million-add GB/s vs
the Ryzen's ~18 GB/s effective, pow throughput) go to stderr and
bench_details.json.

Timing methodology: the TPU tunnel in this environment caches identical
executions and its ``block_until_ready`` can return before remote compute
finishes, so every repeat uses FRESH random inputs (different PRNG key) and
timing brackets a 4-byte device-to-host materialization of an on-device
scalar reduction of the result, which cannot complete early.

Every dispatch through the tunnel additionally costs a fixed ~30 ms
round-trip, independent of compute, which would swamp any microbenchmark.
Kernel benches therefore loop the op on-device with a loop-carried data
dependency and time TWO loop lengths; the difference isolates steady-state
device time per iteration (both runs pay exactly one dispatch).  Bandwidth
benches use >=256 MB operands so the working set cannot become VMEM-resident
(v5e VMEM is 128 MiB) — the reported GB/s is true HBM streaming.

Run: ``python bench.py`` (full, TPU) / ``python bench.py --quick`` (small
shapes, any backend).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalar_sync(x):
    """Force completion with a 4-byte D2H (the relayed tunnel moves large
    buffers at ~50 KB/s, so never materialize full outputs while timing)."""
    total = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(x))
    return float(jnp.real(total))  # real() so complex operands sync too


# (builder, L) -> (builder_ref, jitted reduced fn).  jax.jit caches per
# WRAPPER object, and _timeit builds a fresh wrapper per call — so repeated
# measurements of the same variant (the alternated-A/B rounds) would pay a
# full 30-60 s XLA recompilation per round.  Memoizing the jitted wrapper
# makes rounds 2+ pure measurements.  The builder reference is held so its
# id() can never be recycled onto a different function.
_TIMEIT_MEMO: dict = {}
import itertools as _itertools

_SEEDS = _itertools.count(1)


def _timeit(fn, make_args, warmup: int = 1, repeats: int = 4, memo_key=None):
    """Median wall time of fn(*make_args(key)) with fresh inputs per repeat.

    The output is reduced to a scalar ON DEVICE inside the jitted program,
    so the timed sync transfers 4 bytes but still waits for all compute."""

    reduced = None
    if memo_key is not None:
        hit = _TIMEIT_MEMO.get(memo_key)
        if hit is not None:
            reduced = hit[1]
    if reduced is None:

        @jax.jit
        def reduced(*args):
            out = fn(*args)
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))

        if memo_key is not None:
            _TIMEIT_MEMO[memo_key] = (fn, reduced)

    # Seeds are GLOBALLY monotonic, never recycled: the tunnel serves
    # identical (executable, inputs) executions from a cache (bogus ~0 s
    # timings), and with memoized executables a repeated seed would hit it.
    for w in range(warmup):
        float(reduced(*make_args(next(_SEEDS))))
    times = []
    for i in range(repeats):
        args = make_args(next(_SEEDS))
        _scalar_sync(args)  # stage inputs before the clock starts
        t0 = time.perf_counter()
        float(reduced(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class MeasurementError(RuntimeError):
    """A loop-differenced timing had no usable signal even after retries."""


def _ab_median(builders, make_args, l_short, l_long, rounds=4, repeats=3):
    """Alternated A/B: measure each named variant once per round, cycling
    through the variants ``rounds`` times, and report per-variant
    ``{median_s, spread, samples}`` — the methodology that settled the
    matmul routing (tools/tune_mm2d.py).  A single measurement per variant
    is indistinguishable from the tunnel's ±16% run-to-run jitter
    (BASELINE.md); alternating interleaves the jitter across variants so
    the MEDIAN ratio is trustworthy and the recorded spread bounds the
    claim tolerance (round-4 VERDICT weak #1/#2)."""
    times = {k: [] for k in builders}
    for _ in range(rounds):
        for k, build in builders.items():
            times[k].append(
                _per_iter_time(build, make_args, l_short, l_long, repeats=repeats)
            )
    out = {}
    for k, ts in times.items():
        srt = sorted(ts)
        med = srt[(len(srt) - 1) // 2]
        out[k] = {
            "median_s": med,
            "spread": (max(ts) - min(ts)) / med,
            "samples": ts,
        }
    return out


# Dispatch round-trips jitter by a few ms run-to-run; a long-short loop
# difference below ~5x that jitter is indistinguishable from noise.
_MIN_SIGNAL_S = 0.010


def _per_iter_time(build_run, make_args, l_short, l_long, repeats=3):
    """Steady-state seconds per loop iteration via two-loop-length
    differencing.  ``build_run(L)`` returns a function whose body loops L
    times on-device with a loop-carried dependency.

    The long-short difference must dominate dispatch jitter to mean
    anything: when it comes back below ``_MIN_SIGNAL_S`` (or negative), the
    long loop is doubled and the row re-measured, bounded; if no doubling
    produces signal, raise ``MeasurementError`` so the row records an
    explicit failure.  Never clamp — a clamped 1e-9 "time" produced the
    garbage 1.5M-x speedup row in BENCH_r03 (round-3 VERDICT weak #1)."""
    # memo_key holds the builder OBJECT (strong ref) so a recycled id can
    # never alias a different benchmark's function.
    t_short = _timeit(
        jax.jit(build_run(l_short)), make_args, repeats=repeats,
        memo_key=(build_run, l_short),
    )
    diff = None
    for _ in range(5):
        t_long = _timeit(
            jax.jit(build_run(l_long)), make_args, repeats=repeats,
            memo_key=(build_run, l_long),
        )
        diff = t_long - t_short
        if diff >= _MIN_SIGNAL_S:
            return diff / (l_long - l_short)
        l_long *= 2
    raise MeasurementError(
        f"measurement_failed: long-short loop difference {diff:.3e}s is "
        f"below the {_MIN_SIGNAL_S}s signal floor even at L={l_long // 2} "
        f"(t_short={t_short:.3e}s at L={l_short})"
    )


def bench_million_add(n=1_000_000):
    """Reference million_check (benchmark/add.cpp:21-29): 1M-float add
    through the PUBLIC ``sm.add`` path, google-benchmark style (hot loop
    over resident operands — the Ryzen's 4 MB arrays are L3-resident there
    exactly as ours are VMEM-resident here).  With the default
    pallas_min_elements = 1M, the traced op dispatches to the Pallas
    elementwise kernel on TPU (dispatch counter asserted below).  Reports
    steady-state device time per 1M-float add; the reference's number to
    beat is 666,833 ns wall (README.md:141-145)."""
    import simplemath_tpu as sm
    from simplemath_tpu.ops import dispatch

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                return sm.add(sm.Array(acc), sm.Array(b)).jax()

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, (n,), jnp.float32),
            jax.random.normal(kb, (n,), jnp.float32),
        )

    dispatch.reset()
    # ~2 us/iter steady state (operands VMEM-resident): 32k-iter difference
    # gives >= 45 ms of device-time signal.
    t = _per_iter_time(build_run, make_args, 512, 33280)
    hit_kernel = dispatch.count("elementwise", "add") > 0
    gbps = 3 * n * 4 / t / 1e9
    return {
        "time_s": t,
        "effective_GBps_vmem_resident": gbps,
        "through_pallas_kernel": hit_kernel,
        "vs_ref_666833ns": 666833e-9 / t if n == 1_000_000 else None,
    }


def bench_simple_check():
    """Reference simple_check (benchmark/add.cpp:4-19): construct a 5x5
    float array + add per iteration, through the public API.  Reference:
    2,637 ns wall / 837 ns CPU per iteration (README.md:143).  TPU-native
    deployment runs ops inside a compiled program, so the honest analog is
    steady-state per-iteration time of the traced construct+add (the eager
    path in THIS environment is dominated by the ~30 ms tunnel round-trip,
    which measures the tunnel, not the framework)."""
    import simplemath_tpu as sm

    vals = jnp.arange(25, dtype=jnp.float32).reshape(5, 5)

    def build_run(L):
        def run(seed):
            def body(i, acc):
                a = sm.Array(vals + acc)  # construct from fresh values
                b = sm.Array(vals * jnp.float32(0.5))
                c = sm.add(a, b)  # public add
                return acc + jnp.sum(c.jax()) * jnp.float32(1e-7)

            return jax.lax.fori_loop(0, L, body, seed)

        return run

    def make_args(i):
        return (jnp.float32(i) * jnp.float32(1e-3),)

    t = _per_iter_time(build_run, make_args, 1024, 132096)
    return {"time_s": t, "vs_ref_2637ns": 2637e-9 / t}


def bench_pow_small(shape, exponent, ref_ns, label):
    """Reference BM_SMArrayPow_1D / _2D (benchmark/pow.cpp:5-28): tiny int
    pow through public ``sm.pow`` (static int exponent), steady-state
    per-iteration."""
    import simplemath_tpu as sm

    base = (jnp.arange(np.prod(shape), dtype=jnp.int32) % 5).reshape(shape)

    def build_run(L):
        def run(seed):
            def body(i, acc):
                out = sm.pow(sm.Array(base + (acc & 1)), exponent).jax()
                return acc + jnp.sum(out) % 97

            return jax.lax.fori_loop(0, L, body, seed)

        return run

    def make_args(i):
        return (jnp.zeros(shape, jnp.int32) + jnp.int32(i % 3),)

    t = _per_iter_time(build_run, make_args, 1024, 132096)
    return {"time_s": t, f"vs_ref_{ref_ns}ns": ref_ns * 1e-9 / t}


def bench_tiny_chain(shape=(5, 5), n_ops=5):
    """Deferred-eager queue payoff (round-3 VERDICT item 6): a chain of
    ``n_ops`` tiny elementwise ops through the EAGER public API — no
    sm.fuse — must cost about one dispatch, not ``n_ops`` (ops/lazy.py
    records the chain and flushes it as one kernel at materialization).
    Reports steady-state per-chain time vs the single-op floor measured in
    the same session; the reference's tiny-op rows are
    benchmark/pow.cpp:5-28 (~300 ns each on the Ryzen; the documented
    ~per-launch floor here makes launches, not FLOPs, the cost — so the
    win is launches/chain -> 1)."""
    import simplemath_tpu as sm

    vals = (jnp.arange(np.prod(shape), dtype=jnp.int32) % 5).reshape(shape)
    fvals = vals.astype(jnp.float32)

    def build_chain(L):
        def run(seed):
            def body(i, acc):
                a = sm.Array(fvals + acc)
                # 5 eager public ops: pow, add, multiply, subtract, sqrt.
                r = sm.pow(a, 2)
                r = sm.add(r, 3.0)
                r = sm.multiply(r, a)
                r = sm.subtract(r, 1.5)
                r = sm.sqrt(sm.abs(r))
                return acc + jnp.sum(r.jax()) * jnp.float32(1e-7)

            return jax.lax.fori_loop(0, L, body, seed)

        return run

    def build_single(L):
        def run(seed):
            def body(i, acc):
                out = sm.add(sm.Array(fvals + acc), 3.0).jax()
                return acc + jnp.sum(out) * jnp.float32(1e-7)

            return jax.lax.fori_loop(0, L, body, seed)

        return run

    def make_args(i):
        return (jnp.float32(i % 3),)

    # Kernel launches per chain, counted at trace time under forced-Pallas:
    # the queue turns the op-per-launch chain into ONE fused launch.
    from simplemath_tpu.config import config as smconfig
    from simplemath_tpu.ops import dispatch

    def _count_launches():
        dispatch.reset()
        jax.make_jaxpr(build_chain(1))(jnp.float32(0.0))
        return sum(
            v for k, v in dispatch.counts().items()
            if k.startswith("elementwise:")
        )

    old_backend, old_flag = smconfig.kernel_backend, smconfig.deferred_eager
    smconfig.kernel_backend = "pallas"
    try:
        launches_deferred = _count_launches()
        smconfig.deferred_eager = False
        launches_immediate = _count_launches()
    finally:
        smconfig.kernel_backend = old_backend
        smconfig.deferred_eager = old_flag

    t_chain = _per_iter_time(build_chain, make_args, 1024, 132096)
    t_single = _per_iter_time(build_single, make_args, 1024, 132096)
    return {
        "shape": list(shape),
        "n_ops": n_ops,
        "chain_time_s": t_chain,
        "single_op_time_s": t_single,
        "chain_over_single": t_chain / t_single,
        "meets_2x_floor": t_chain <= 2.0 * t_single,
        "launches_per_chain_deferred": launches_deferred,
        "launches_per_chain_immediate": launches_immediate,
    }


def bench_dot1d(n=32 * 1024 * 1024):
    """Fused 1-D dot kernel through public ``sm.dot`` (the reference's
    ``operator%`` / product.h path): HBM-streaming GB/s.  Operands are
    128 MB each (256 MB total) so the working set cannot hide in VMEM and
    the reported number is true HBM streaming (round-2 VERDICT item 5
    fixed: the old 8M-float operands were VMEM-resident and reported a
    bogus roofline_fraction of 2.46)."""
    import simplemath_tpu as sm

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                s = sm.dot(sm.Array(a + acc * jnp.float32(1e-9)), sm.Array(b))
                return acc + s.jax() * jnp.float32(1e-9)

            return jax.lax.fori_loop(0, L, body, jnp.float32(0.0))

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, (n,), jnp.float32),
            jax.random.normal(kb, (n,), jnp.float32),
        )

    t = _per_iter_time(build_run, make_args, 16, 272)
    # Per iteration: the loop-dependency perturbation costs one extra
    # read+write pass over `a` (n+n), then the fused dot kernel reads both
    # operands (2n) — 4n floats of HBM traffic total.
    gbps = 4 * n * 4 / t / 1e9
    from simplemath_tpu.utils.profiling import hbm_bandwidth_bytes_per_s

    return {
        "time_s": t,
        "GBps": gbps,
        "roofline_fraction": gbps * 1e9 / hbm_bandwidth_bytes_per_s(),
    }


def bench_fused_map_reduce(n=32 * 1024 * 1024):
    """Fused map+reduce through the public API: ``sm.fuse(lambda a, b:
    sm.sum(sm.square(a - b)))`` — squared L2 distance of two 128 MB
    operands in ONE HBM pass (the generalization of the fused 1-D dot;
    round-4 FusedReduction).  vs_xla compares the same expression as raw
    jnp ops (which XLA also fuses into one pass — parity is the bar)."""
    import simplemath_tpu as sm

    # The loop-dependency perturbation rides as a 0-d OPERAND inside the
    # fused expression, so the kernel's HBM traffic is exactly the two
    # operand reads — the same pass structure XLA's fused comparator has.
    fused = sm.fuse(lambda a, b, eps: sm.sum(sm.square(a + eps - b)))

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                s = fused(a, b, acc * jnp.float32(1e-9)).jax()
                return acc + s * jnp.float32(1e-9)

            return jax.lax.fori_loop(0, L, body, jnp.float32(0.0))

        return run

    def build_run_xla(L):
        def run(a, b):
            def body(i, acc):
                s = jnp.sum(jnp.square(a + acc * jnp.float32(1e-9) - b))
                return acc + s * jnp.float32(1e-9)

            return jax.lax.fori_loop(0, L, body, jnp.float32(0.0))

        return run

    def make_args(i):
        ka, kb = jax.random.split(jax.random.PRNGKey(i))
        return (
            jax.random.normal(ka, (n,), jnp.float32),
            jax.random.normal(kb, (n,), jnp.float32),
        )

    t = _per_iter_time(build_run, make_args, 16, 272)
    t_xla = _per_iter_time(build_run_xla, make_args, 16, 272)
    # One pass: both operands read once (2n floats) — the eps perturbation
    # is a 0-d operand folded into the kernel, matching XLA's fusion.
    gbps = 2 * n * 4 / t / 1e9
    from simplemath_tpu.utils.profiling import hbm_bandwidth_bytes_per_s

    return {
        "time_s": t,
        "GBps": gbps,
        "roofline_fraction": gbps * 1e9 / hbm_bandwidth_bytes_per_s(),
        "vs_xla": t_xla / t,
    }


def bench_reduce_sum(n=64 * 1024 * 1024):
    """Public ``Array.sum()`` -> Pallas tiled reduction: HBM GB/s (256 MB
    operand, true HBM streaming)."""
    import simplemath_tpu as sm

    def build_run(L):
        def run(a):
            def body(i, acc):
                s = sm.Array(a + acc * jnp.float32(1e-9)).sum()
                return acc + s.jax() * jnp.float32(1e-9)

            return jax.lax.fori_loop(0, L, body, jnp.float32(0.0))

        return run

    def make_args(i):
        return (jax.random.normal(jax.random.PRNGKey(i), (n,), jnp.float32),)

    t = _per_iter_time(build_run, make_args, 16, 272)
    # Perturbation pass (n+n) + reduction read (n) = 3n floats per iter.
    gbps = 3 * n * 4 / t / 1e9
    from simplemath_tpu.utils.profiling import hbm_bandwidth_bytes_per_s

    return {
        "time_s": t,
        "GBps": gbps,
        "roofline_fraction": gbps * 1e9 / hbm_bandwidth_bytes_per_s(),
    }


def bench_elementwise_pallas(n=64 * 1024 * 1024):
    """Generic Pallas elementwise kernel: true HBM streaming GB/s vs
    roofline.  256 MB operands (>VMEM) so every byte moves through HBM;
    the loop carry is donated to the kernel so the output is written in
    place (traffic = read acc + read b + write acc = 3n*4 bytes/iter)."""
    from simplemath_tpu.ops import elementwise

    shape = (n // 1024, 1024)
    decay = np.float32(0.999)

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                return elementwise.pallas_elementwise(
                    lambda x, y: x * decay + y,
                    shape,
                    jnp.float32,
                    acc,
                    b,
                    name="bench_axpy",
                    donate=0,
                )

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, shape, jnp.float32),
            jax.random.normal(kb, shape, jnp.float32),
        )

    # ~1 ms/iter at 256 MB operands: 64-iter difference is ~70 ms of signal.
    t = _per_iter_time(build_run, make_args, 16, 80)
    gbps = 3 * n * 4 / t / 1e9
    from simplemath_tpu.utils.profiling import hbm_bandwidth_bytes_per_s

    return {
        "time_s": t,
        "GBps": gbps,
        "roofline_fraction": gbps * 1e9 / hbm_bandwidth_bytes_per_s(),
    }


def bench_view_add(n=8192):
    """View operand read INSIDE the kernel (ops/viewkernel.py) vs the
    round-4 materialize-then-kernel path and the XLA fused transpose+add.

    ``sm.add(a.T, b)`` at n x n f32: the view plan streams the base buffer
    through a permuted BlockSpec index map with an in-VMEM tile transpose
    (no extra HBM pass); round 4 paid ``ViewSpec.read`` — a full relayout
    copy — first.  The reference reads transposed views in its strided hot
    loop (include/math/calculate.h:16-99, include/SMArray.h:121-136); this
    row shows the TPU equivalent at full streaming rate.

    n must be large enough that the loop working set (3 n^2 floats)
    exceeds VMEM: at 2048^2 the whole 48 MB loop stays VMEM-resident on a
    v5e (128 MB) and every variant measures VMEM — not HBM — bandwidth
    (a measured 3.1x-"roofline" artifact).  8192^2 = 805 MB of traffic
    per iteration cannot cache."""
    from simplemath_tpu.ops import elementwise, viewkernel
    from simplemath_tpu.viewspec import ViewSpec

    shape = (n, n)
    decay = np.float32(0.999)
    blocks = elementwise.choose_blocks_for(
        shape, (jnp.float32, jnp.float32), jnp.float32
    )
    plan = viewkernel.plan_view(
        ViewSpec.identity(shape).transpose(), shape, blocks, jnp.float32
    )
    assert plan is not None and plan.swap

    def tile(x, y):
        return x + y * decay

    def build_run(L):
        # donate=1: the loop-carry operand aliases the output — without it
        # XLA inserts a copy-back into the carry buffer (an extra
        # read+write per iteration, measured 691 -> 402 GB/s on the plain
        # elementwise row).
        def run(a, b):
            def body(i, acc):
                return elementwise.pallas_elementwise(
                    tile, shape, jnp.float32, a, acc,
                    name="bench_view_add", plans=(plan, None), donate=1,
                )

            return jax.lax.fori_loop(0, L, body, b)

        return run

    # Comparators must be hoist-proof: ``jnp.transpose(a)`` of a
    # loop-INVARIANT operand gets hoisted out of the fori_loop by XLA (the
    # loop then measures only the dense add — a measured artifact, not a
    # comparison), so both comparators transpose the loop CARRY instead.
    def build_run_tcopy(L):
        # Bare XLA transpose-copy — the materialization pass the round-4
        # path paid before its kernel (old path = this + the dense kernel).
        def run(a, b):
            def body(i, acc):
                return jnp.transpose(acc)

            return jax.lax.fori_loop(0, L, body, b)

        return run

    def build_run_dense(L):
        # The same kernel on already-dense operands (donated carry).
        def run(a, b):
            def body(i, acc):
                return elementwise.pallas_elementwise(
                    tile, shape, jnp.float32, a, acc,
                    name="bench_view_add_dense", donate=1,
                )

            return jax.lax.fori_loop(0, L, body, b)

        return run

    def build_run_xla(L):
        # XLA's fused transpose+consumer, transpose on the carry so it
        # cannot be hoisted.
        def run(a, b):
            def body(i, acc):
                return jnp.transpose(acc) + a * decay

            return jax.lax.fori_loop(0, L, body, b)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, shape, jnp.float32),
            jax.random.normal(kb, shape, jnp.float32),
        )

    # ~1 ms/iter at 8192^2 (805 MB HBM traffic): 48-iter difference ~50 ms.
    l_short, l_long = (8, 56) if n >= 8192 else (16, 400)
    t = _per_iter_time(build_run, make_args, l_short, l_long)
    t_tcopy = _per_iter_time(build_run_tcopy, make_args, l_short, l_long)
    t_dense = _per_iter_time(build_run_dense, make_args, l_short, l_long)
    t_xla = _per_iter_time(build_run_xla, make_args, l_short, l_long)
    # Round-4 cost of sm.add(a.T, b): materialize the view (XLA transpose
    # copy), then the dense kernel — the sum of two honestly-measured
    # pieces (a single loop doing both cannot be made hoist-proof without
    # changing one of the dataflows).
    t_old = t_tcopy + t_dense
    gbps = 3 * n * n * 4 / t / 1e9
    from simplemath_tpu.utils.profiling import hbm_bandwidth_bytes_per_s

    return {
        "time_s": t,
        "GBps": gbps,
        "roofline_fraction": gbps * 1e9 / hbm_bandwidth_bytes_per_s(),
        "transpose_copy_time_s": t_tcopy,
        "dense_kernel_time_s": t_dense,
        "materialize_time_s": t_old,
        "vs_materialize": t_old / t,
        "xla_time_s": t_xla,
        "vs_xla": t_xla / t,
    }


def bench_reduce_axis(n=8192):
    """Row/column reduction kernel (ops/reduction.py::pallas_reduce_axis)
    at (n, n) f32 -> (n,) vs XLA's native axis reduce.

    The loop threads a scalar carry INTO the mapped expression (a pinned
    (1,1) operand of the map+reduce kernel / a fused scalar in the XLA
    comparator) through a non-factorable select, so neither engine can
    hoist or algebraically factor the reduction out of the loop (a plain
    ``sum(a*s)`` gets rewritten to ``s*sum(a)`` and hoisted — measured
    1.7 TB/s artifacts)."""
    from simplemath_tpu.ops import reduction

    shape = (n, n)

    def sel_tile(x, s):
        return jnp.where(x > s, x, jnp.float32(0.0))

    def mk_build(fn):
        def build_run(L):
            def run(a):
                def body(i, s):
                    out = fn(a, s)
                    return jnp.float32(1.0) + jnp.float32(1e-30) * jnp.sum(out)

                return jax.lax.fori_loop(0, L, body, jnp.float32(1.0))

            return run

        return build_run

    def make_args(i):
        return (jax.random.normal(jax.random.PRNGKey(i), shape, jnp.float32),)

    from simplemath_tpu.utils.profiling import hbm_bandwidth_bytes_per_s

    roof = hbm_bandwidth_bytes_per_s()
    out = {}
    for axis in (0, 1):
        k = mk_build(
            lambda a, s, ax=axis: reduction.pallas_map_reduce_axis(
                sel_tile, "sum", ax, a.shape, a, jnp.reshape(s, (1, 1))
            )
        )
        t = _per_iter_time(k, make_args, 8, 72)
        x = mk_build(
            lambda a, s, ax=axis: jnp.sum(jnp.where(a > s, a, 0.0), axis=ax)
        )
        t_xla = _per_iter_time(x, make_args, 8, 72)
        gbps = n * n * 4 / t / 1e9
        out[f"axis{axis}"] = {
            "time_s": t,
            "GBps": gbps,
            "roofline_fraction": gbps * 1e9 / roof,
            "xla_time_s": t_xla,
            "vs_xla": t_xla / t,
        }
    return out


def bench_pow(n=1000):
    """Reference BM_SMArrayPow_Large (benchmark/pow.cpp:33-49): NxN float
    pow^2 through the public ``sm.pow`` — which, like the reference's call
    site, sees a static exponent and specializes to repeated squaring.
    Looped on-device with a varying base (acc-coupled) to defeat caching;
    steady-state per-iteration time via loop-length differencing (includes
    one accumulate multiply-add per iteration)."""
    import simplemath_tpu as sm

    def build_run(L):
        def run(a):
            def body(i, acc):
                return (
                    acc * np.float32(1e-3)
                    + sm.pow(sm.Array(a + acc * np.float32(1e-6)), 2).jax()
                )

            return jax.lax.fori_loop(0, L, body, jnp.zeros_like(a))

        return run

    def make_args(i):
        return (
            jax.random.uniform(
                jax.random.PRNGKey(i), (n, n), jnp.float32, 0.5, 100.0
            ),
        )

    # ~10 us/iter (1M floats, VMEM-resident): 4k-iter difference ~= 40 ms.
    t = _per_iter_time(build_run, make_args, 64, 4160)
    # Reference: 1000x1000 in 934,838 ns wall (README.md:154).
    return {"time_s": t, "vs_ref_1000": (934838e-9 / t) if n == 1000 else None}


def bench_small_pow_batched(batch=200_000):
    """The TPU-native answer to the reference's 300 ns tiny-pow rows
    (benchmark/pow.cpp:5-28): a single tiny op can never beat a ~300 ns
    CPU call from a host-dispatched accelerator (the documented latency
    floor, BASELINE.md) — but tiny ops never arrive alone in a deployed
    controller, and a lane-packed BATCH of them is one VPU-wide kernel.
    Measures ``sm.pow`` on a (B, 3, 3) int32 stack (public path: flattens
    to the 1-D crafted-pow kernel, ops/elementwise.py) and reports
    equivalent tiny-pows/s vs the reference's 1/297ns."""
    import simplemath_tpu as sm
    from simplemath_tpu.ops import dispatch

    base = (jnp.arange(batch * 9, dtype=jnp.int32) % 5).reshape(batch, 3, 3)

    def build_run(L):
        def run(seed):
            def body(i, acc):
                out = sm.pow(sm.Array(base + (acc & 1)), 2).jax()
                return acc + jnp.sum(out) % 97

            return jax.lax.fori_loop(0, L, body, seed)

        return run

    def make_args(i):
        return (jnp.int32(i % 3),)

    dispatch.reset()
    t = _per_iter_time(build_run, make_args, 64, 2112)
    pows_per_s = batch / t
    ref_pows_per_s = 1.0 / 297e-9
    return {
        "batch": batch,
        "time_s": t,
        "through_pallas_kernel": dispatch.count("elementwise", "ipow") > 0,
        "tiny_pows_per_s": pows_per_s,
        "vs_ref_throughput": pows_per_s / ref_pows_per_s,
    }


def bench_fused_pipeline(n=2048, l_short=16, l_long=400, ab_rounds=1):
    """BASELINE.json configs[1]: fused broadcast+pow+exp elementwise
    pipeline on 2-D float arrays (benchmark_pow parity workload, extended
    with the exp stage the reference never shipped working).

    ``acc = acc*d + exp(pow(a + acc*eps, e_row))`` iterated L times, where
    the exponent row (1, n) broadcasts against (n, n) — through the public
    ``sm`` API.  The headline form is ``sm.fuse(..., iterations=L)``: the
    WHOLE L-iteration recurrence runs inside ONE kernel launch with the
    carry VMEM-resident across iterations (round-3 VERDICT item 2 — the
    capability XLA's fusion loop has that a launch-per-iteration chain
    lacks).  There is no reference number (its float pow/exp are
    disabled/broken, README.md:7-10), so ``vs_xla`` compares against the
    same recurrence as raw XLA ops in a fori_loop; ``one_launch_per_iter``
    records the round-3 fused form and ``unfused`` the op-per-kernel
    chain, for the record."""
    import simplemath_tpu as sm
    from simplemath_tpu.ops import dispatch

    shape = (n, n)

    def chain(acc, a, e_row):
        return acc * np.float32(1e-3) + sm.exp(
            sm.pow(a + acc * np.float32(1e-6), e_row)
        )

    fused = sm.fuse(chain, donate=0)

    def build_run_iterated(L):
        fused_L = sm.fuse(chain, donate=0, iterations=L)

        def run(a, e_row):
            return fused_L(jnp.zeros_like(a), a, e_row).jax()

        return run

    def build_run_fused(L):
        def run(a, e_row):
            def body(i, acc):
                return fused(acc, a, e_row).jax()

            return jax.lax.fori_loop(0, L, body, jnp.zeros_like(a))

        return run

    def build_run_chain(L):
        def run(a, e_row):
            def body(i, acc):
                y = sm.exp(sm.pow(sm.Array(a + acc * np.float32(1e-6)),
                                  sm.Array(e_row)))
                return acc * np.float32(1e-3) + y.jax()

            return jax.lax.fori_loop(0, L, body, jnp.zeros_like(a))

        return run

    def build_run_xla(L):
        def run(a, e_row):
            def body(i, acc):
                y = jnp.exp(jnp.power(a + acc * np.float32(1e-6), e_row))
                return acc * np.float32(1e-3) + y

            return jax.lax.fori_loop(0, L, body, jnp.zeros_like(a))

        return run

    def make_args(i):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        return (
            jax.random.uniform(k1, shape, jnp.float32, 0.5, 2.0),
            jax.random.uniform(k2, (1, n), jnp.float32, -2.0, 2.0),
        )

    dispatch.reset()
    if ab_rounds > 1:
        # The headline comparison (iterated kernel vs XLA's fusion loop)
        # runs as an alternated A/B with a median + recorded spread — a
        # single sample per variant was noise-limited at this size
        # (round-4 committed 0.88 from one sample; round-4 VERDICT
        # weak #1).
        ab = _ab_median(
            {"sm": build_run_iterated, "xla": build_run_xla},
            make_args, l_short, l_long, rounds=ab_rounds,
        )
        t_sm = ab["sm"]["median_s"]
        t_xla = ab["xla"]["median_s"]
        ab_detail = ab
    else:
        t_sm = _per_iter_time(build_run_iterated, make_args, l_short, l_long)
        t_xla = _per_iter_time(build_run_xla, make_args, l_short, l_long)
        ab_detail = None
    one_launch = dispatch.count("elementwise", "fused") > 0
    t_fused = _per_iter_time(build_run_fused, make_args, l_short, l_long)
    t_chain = _per_iter_time(build_run_chain, make_args, l_short, l_long)
    out = {
        "shape": list(shape),
        "time_s": t_sm,
        "ns_per_element": t_sm / (n * n) * 1e9,
        "gelements_per_s": n * n / t_sm / 1e9,
        "through_fused_kernel": one_launch,
        "vs_xla": t_xla / t_sm,
        "one_launch_per_iter": {"time_s": t_fused, "vs_xla": t_xla / t_fused},
        "unfused": {"time_s": t_chain, "vs_xla": t_xla / t_chain},
    }
    if ab_detail is not None:
        out["ab"] = ab_detail
    return out


def bench_matmul(n=2048, dtype="bfloat16"):
    """MXU matmul TF/s through the public ``sm.dot`` path (measured
    routing: Pallas kernel for bf16, XLA dot for f32 — ops/engine.py), with
    a SAME-SESSION ``jnp.dot`` row so the "route by measured speed" claim
    is re-checked on every bench run (round-2 VERDICT item 3)."""
    import simplemath_tpu as sm

    dt = jnp.dtype(dtype)
    scale = np.float32(1.0 / n)

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                return (sm.dot(sm.Array(acc), sm.Array(b)).jax() * scale).astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def build_run_xla(L):
        def run(a, b):
            def body(i, acc):
                return (jnp.dot(acc, b) * scale).astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, (n, n), dt),
            jax.random.normal(kb, (n, n), dt),
        )

    # ~90 us/iter at 2048^3: a 896-iteration difference gives ~80 ms of
    # device-time signal, holding run-to-run jitter to a few percent.
    t = _per_iter_time(build_run, make_args, 64, 960)
    t_xla = _per_iter_time(build_run_xla, make_args, 64, 960)
    tflops = 2 * n**3 / t / 1e12
    peak = 197.0  # v5e MXU peak (bf16) TF/s
    return {
        "time_s": t,
        "TFLOPs": tflops,
        "mxu_peak_fraction": tflops / peak,
        "xla_TFLOPs": 2 * n**3 / t_xla / 1e12,
        "vs_xla": t_xla / t,
    }


def bench_matmul_epilogue(n=2048, dtype="bfloat16"):
    """Fused matmul epilogue: ``relu(x @ W + b) * s - c`` as ONE MXU kernel
    (sm.fuse matmul root, ops/matmul.py epilogue) vs the jitted XLA
    composite.  The epilogue applies to the f32 accumulator in VMEM during
    the final K-step, so the (M, N) intermediate never round-trips HBM —
    the regime where the in-house MXU kernel can win rather than trail
    XLA's bare dot (round-4 VERDICT item 2).  Also reports the bare-matmul
    kernel time so the epilogue's marginal cost is visible."""
    import simplemath_tpu as sm

    dt = jnp.dtype(dtype)
    scale = np.float32(1.0 / n)
    half = np.float32(0.5)

    fused = sm.fuse(
        lambda x, w, bias: sm.maximum(x @ w + bias, 0.0) * scale - half
    )

    def build_run(L):
        def run(a, b, bias):
            def body(i, acc):
                return fused(sm.Array(acc), sm.Array(b), sm.Array(bias)).jax().astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def build_run_xla(L):
        def run(a, b, bias):
            def body(i, acc):
                return (
                    jnp.maximum(jnp.dot(acc, b) + bias, 0.0) * scale - half
                ).astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def build_run_bare(L):
        from simplemath_tpu.ops import matmul as mm_mod

        def run(a, b, bias):
            def body(i, acc):
                return (mm_mod.pallas_matmul(acc, b, dt) * scale).astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb, kc = jax.random.split(k, 3)
        return (
            jax.random.normal(ka, (n, n), dt),
            jax.random.normal(kb, (n, n), dt),
            jax.random.normal(kc, (1, n), dt),
        )

    t = _per_iter_time(build_run, make_args, 64, 960)
    t_xla = _per_iter_time(build_run_xla, make_args, 64, 960)
    t_bare = _per_iter_time(build_run_bare, make_args, 64, 960)
    tflops = 2 * n**3 / t / 1e12
    return {
        "time_s": t,
        "TFLOPs": tflops,
        "bare_kernel_time_s": t_bare,
        "epilogue_marginal_cost": t / t_bare - 1.0,
        "xla_time_s": t_xla,
        "xla_TFLOPs": 2 * n**3 / t_xla / 1e12,
        "vs_xla": t_xla / t,
    }


def bench_int8_matmul(n=2048):
    """s8 x s8 -> s32 on the MXU's int8 path (sm.int8_matmul): TOPS vs the
    bf16 row's TF/s (the int8 MACs/cycle are ~2x bf16 on v5e) and vs
    XLA's own int8 dot.  The carry re-quantizes the i32 output back to
    int8 each iteration (the quantized-inference dataflow)."""
    import simplemath_tpu as sm

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                out = sm.int8_matmul(sm.Array(acc), sm.Array(b)).jax()
                return (out >> 12).astype(jnp.int8)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def build_run_xla(L):
        def run(a, b):
            def body(i, acc):
                out = jnp.matmul(acc, b, preferred_element_type=jnp.int32)
                return (out >> 12).astype(jnp.int8)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.randint(ka, (n, n), -127, 128, jnp.int8),
            jax.random.randint(kb, (n, n), -127, 128, jnp.int8),
        )

    t = _per_iter_time(build_run, make_args, 64, 960)
    t_xla = _per_iter_time(build_run_xla, make_args, 64, 960)
    tops = 2 * n**3 / t / 1e12
    return {
        "time_s": t,
        "TOPS": tops,
        "xla_TOPS": 2 * n**3 / t_xla / 1e12,
        "vs_xla": t_xla / t,
    }


def bench_bmm(B=8, n=1024, dtype="bfloat16"):
    """Batched rank-3 matmul TF/s through public ``sm.matmul``, with the
    same-session ``jnp.matmul`` comparator (routing stays measured)."""
    import simplemath_tpu as sm

    dt = jnp.dtype(dtype)
    scale = np.float32(1.0 / n)

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                return (sm.matmul(sm.Array(acc), sm.Array(b)).jax() * scale).astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def build_run_xla(L):
        def run(a, b):
            def body(i, acc):
                return (jnp.matmul(acc, b) * scale).astype(dt)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, (B, n, n), dt),
            jax.random.normal(kb, (B, n, n), dt),
        )

    t = _per_iter_time(build_run, make_args, 16, 400)
    t_xla = _per_iter_time(build_run_xla, make_args, 16, 400)
    tflops = 2 * B * n**3 / t / 1e12
    peak = 197.0
    return {
        "time_s": t,
        "TFLOPs": tflops,
        "mxu_peak_fraction": tflops / peak,
        "xla_TFLOPs": 2 * B * n**3 / t_xla / 1e12,
        "vs_xla": t_xla / t,
    }


def bench_c64_matmul(n=2048):
    """complex64 matmul TF/s through public ``sm.dot`` — the TPU-native
    product.h:168-224 analog (three f32 MXU contractions via the Gauss
    split, ops/complexmm.py).  ``TFLOPs`` uses the standard 8*n^3 real-op
    count of the naive complex product; ``mxu_TFLOPs`` counts the 6*n^3
    the Gauss form actually executes.

    Guarded by the subprocess c64 capability probe: the axon tunnel
    backend in this environment returns UNIMPLEMENTED for every c64
    computation AND wedges the client afterwards (measured — it killed
    every subsequent row of a full bench run), so on such backends the
    row records an explicit skip instead of poisoning the run.  XLA:TPU
    proper supports c64; the math itself is validated in
    tests/test_complex_and_debug.py on every capable backend."""
    import simplemath_tpu as sm
    from simplemath_tpu.config import backend_supports_complex64

    if not backend_supports_complex64():
        return {
            "skipped": "active backend cannot execute complex64 "
            "(tunneled TPU plugin; probe ran in a subprocess)"
        }

    scale = np.float32(1.0 / n)

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                return (sm.dot(sm.Array(acc), sm.Array(b)).jax() * scale).astype(
                    jnp.complex64
                )

            out = jax.lax.fori_loop(0, L, body, a)
            # real-valued output so the scalar-sync float() works
            return jnp.real(out) + jnp.imag(out)

        return run

    def make_args(i):
        ka, kb, kc, kd = jax.random.split(jax.random.PRNGKey(i), 4)
        mk = lambda kr, ki: (  # noqa: E731
            jax.random.normal(kr, (n, n), jnp.float32)
            + 1j * jax.random.normal(ki, (n, n), jnp.float32)
        ).astype(jnp.complex64)
        return (mk(ka, kb), mk(kc, kd))

    t = _per_iter_time(build_run, make_args, 16, 272)
    return {
        "time_s": t,
        "TFLOPs": 8 * n**3 / t / 1e12,
        "mxu_TFLOPs": 6 * n**3 / t / 1e12,
    }


def bench_long_horizon(batch=512, horizon=1000, iters=2):
    """O(log H) payoff at scale: batched cartpole solves at H=1000 with the
    SoA associative backward vs the SoA sequential backward (round-1
    VERDICT item 7 'done' criterion)."""
    from simplemath_tpu.models import ILQRConfig, make_cartpole

    system = make_cartpole()
    out = {}
    for mode in ("sequential", "associative"):
        t = _ilqr_bench(
            system, batch, horizon, iters, backward=mode
        )
        out[mode] = {"time_s": t, "solves_per_s": batch / t}
    out["associative_speedup"] = (
        out["sequential"]["time_s"] / out["associative"]["time_s"]
    )
    return out


def bench_horizon_crossover(batch=8, horizons=(1024, 4096, 16384), iters=1):
    """O(log H) payoff in the LATENCY-BOUND regime (round-2 VERDICT item
    5): small batch (the chip is nowhere near throughput-saturated, so
    sequential depth is the critical path), very long horizons, sequential
    vs associative-scan Riccati backward.  Steady-state per-solve time via
    loop-length differencing; reports the speedup at each H so the
    crossover is on record (the throughput regime at batch 512 measured
    1.01x in round 2 — depth cannot matter on a saturated chip)."""
    from simplemath_tpu.models import ILQRConfig, make_cartpole
    from simplemath_tpu.models.ilqr import solve_batched

    system = make_cartpole()
    out = {"batch": batch, "iterations": iters, "rows": []}
    for H in horizons:
        row = {"horizon": H}

        def make_builder(mode, H=H):
            cfg = ILQRConfig(iterations=iters, backward=mode)
            us = jnp.zeros((batch, H, system.nu), jnp.float32)

            def build_run(L, cfg=cfg, us=us):
                def run(x0s):
                    def body(i, acc):
                        c = solve_batched(
                            system, x0s + acc * jnp.float32(1e-9), us, cfg
                        ).cost
                        return acc + jnp.sum(c) * jnp.float32(1e-12)

                    return jax.lax.fori_loop(0, L, body, jnp.float32(0.0))

                return run

            return build_run

        def make_args(i):
            return (
                0.2
                * jax.random.normal(
                    jax.random.PRNGKey(i), (batch, system.nx), jnp.float32
                ),
            )

        # Alternated A/B per horizon (round-4 VERDICT weak #2: the
        # single-sample H=4096 row recorded a non-monotonic 0.91 once);
        # medians + recorded spread make the crossover table a
        # measurement, not a point sample.  l_long pre-sized so the
        # >=10 ms signal floor is met without l_long-doubling recompiles
        # (associative per-solve ~ H * 1.5 us at batch 8).
        l_long = 1 + max(2, int(0.012 / (H * 1.5e-6)) + 1)
        ab = _ab_median(
            {m: make_builder(m) for m in ("sequential", "associative")},
            make_args, 1, l_long, rounds=4, repeats=2,
        )
        for m in ("sequential", "associative"):
            row[m] = ab[m]["median_s"]
            row[f"{m}_spread"] = ab[m]["spread"]
        row["associative_speedup"] = row["sequential"] / row["associative"]
        out["rows"].append(row)
    out["max_speedup"] = max(r["associative_speedup"] for r in out["rows"])
    return out


def bench_sharding_overhead_proxy():
    """Sharding-machinery cost on the 8-virtual-device CPU mesh at CONSTANT
    total work (same batch unsharded on one device vs shard_map'd over 8),
    run in a subprocess so the TPU-pinned parent process is untouched.

    This row deliberately reports ONLY the overhead ratio: a weak-scaling
    efficiency curve on virtual CPU devices is physically meaningless (the
    "devices" share the same cores, so n-fold work on fixed silicon must
    slow down — BENCH_r03's 0.26 "efficiency" measured exactly that,
    round-3 VERDICT weak #6).  The weak_scaling_report harness remains for
    real multi-chip meshes, where per-device silicon actually scales; the
    collective structure itself is validated by dryrun_multichip and the
    sharded test suite."""
    import json as _json
    import subprocess
    import sys

    child = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import json\n"
        "from simplemath_tpu.parallel.scaling import sharding_overhead_report\n"
        "r = sharding_overhead_report(total_batch=512, horizon=50,"
        " iterations=3)\n"
        "print('WSR ' + json.dumps(r))\n"
    )
    import os

    env = {
        **os.environ,
        "XLA_FLAGS": (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip(),
    }
    proc = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        return {"error": proc.stderr[-1500:]}
    for line in proc.stdout.splitlines():
        if line.startswith("WSR "):
            return _json.loads(line[4:])
    return {"error": "no WSR line in output"}


def bench_sharded_overhead(batch=1024, horizon=50, iters=3):
    """Single-chip vs sharded(1)-on-a-one-device-mesh solve: the shard_map
    wrapping overhead that multi-chip runs pay per chip."""
    from simplemath_tpu.models import ILQRConfig, make_cartpole
    from simplemath_tpu.models.ilqr import solve_batched
    from simplemath_tpu.parallel import make_mesh, sharded

    system = make_cartpole()
    cfg = ILQRConfig(iterations=iters)
    us = jnp.zeros((batch, horizon, system.nu), jnp.float32)

    def make_args(i):
        x0s = 0.2 * jax.random.normal(
            jax.random.PRNGKey(i), (batch, system.nx), dtype=jnp.float32
        )
        return (x0s, us)

    plain = jax.jit(lambda x, u: solve_batched(system, x, u, cfg).cost)
    t_plain = _timeit(plain, make_args, warmup=1, repeats=3)

    mesh = make_mesh((1,), ("scenario",), devices=jax.devices()[:1])
    step = sharded.make_sharded_train_step(system, mesh, cfg, "scenario")
    shard = jax.jit(lambda x, u: step(x, u)[1]["total_cost"])
    t_shard = _timeit(shard, make_args, warmup=1, repeats=3)
    return {
        "plain_s": t_plain,
        "sharded1_s": t_shard,
        "overhead_fraction": (t_shard - t_plain) / t_plain,
    }


def _ilqr_bench(system, batch, horizon, iters, backward="sequential"):
    from simplemath_tpu.models import ILQRConfig
    from simplemath_tpu.models.ilqr import solve_batched

    cfg = ILQRConfig(iterations=iters, backward=backward)
    us = jnp.zeros((batch, horizon, system.nu), jnp.float32)
    fn = jax.jit(lambda x, u: solve_batched(system, x, u, cfg).cost)

    def make_args(i):
        x0s = 0.2 * jax.random.normal(
            jax.random.PRNGKey(i), (batch, system.nx), dtype=jnp.float32
        )
        return (x0s, us)

    t = _timeit(fn, make_args, warmup=1, repeats=3)
    return t


def bench_cartpole(batch=8192, horizon=100, iters=10, quick=False):
    from simplemath_tpu.models import make_cartpole

    if quick:
        batch, horizon, iters = 256, 50, 5
    t = _ilqr_bench(make_cartpole(), batch, horizon, iters)
    solves_per_s = batch / t
    return {
        "time_s": t,
        "batch": batch,
        "horizon": horizon,
        "iterations": iters,
        "solves_per_s": solves_per_s,
        "vs_target_10k": solves_per_s / 10_000.0,
    }


def bench_pendulum(batch=4096, horizon=50, iters=10, quick=False):
    from simplemath_tpu.models import make_pendulum

    if quick:
        batch, horizon, iters = 128, 25, 3
    t = _ilqr_bench(make_pendulum(), batch, horizon, iters)
    return {"time_s": t, "batch": batch, "solves_per_s": batch / t}


def bench_quadrotor_replan(horizon=50, loop_steps=200):
    """MPC replan latency (1 kHz budget = 1 ms per replan).

    Uses the parallel-in-time RTI solver (models/rti.py): linearize
    (parallel) + associative-scan backward + associative-scan affine
    forward, O(log H) sequential depth — the only structure that fits the
    budget given this platform's ~12 us per-sequential-step floor.  Runs a
    closed control loop ON DEVICE (`loop_steps` ticks inside one jitted
    lax.scan), so per-replan time excludes host dispatch, which a deployed
    TPU-resident controller also avoids."""
    from simplemath_tpu.models import make_quadrotor
    from simplemath_tpu.models import rti as _rti

    system = make_quadrotor()

    def build_run(ticks):
        def run(x0):
            xs, us, costs, defects = _rti.rti_closed_loop(
                system, x0, horizon=horizon, ticks=ticks
            )
            return costs

        return run

    def make_args(i):
        return (
            0.1
            * jax.random.normal(
                jax.random.PRNGKey(i), (system.nx,), dtype=jnp.float32
            ),
        )

    # Steady-state per-tick time: difference two closed-loop lengths so the
    # fixed ~30 ms tunnel dispatch (which a TPU-resident controller never
    # pays per replan) cancels out.
    t = _per_iter_time(build_run, make_args, loop_steps, 3 * loop_steps)
    return {"replan_s": t, "replan_hz": 1.0 / t, "meets_1khz": t < 1e-3}


def _quick_skip():
    """--quick shapes for the HBM-streaming rows sit below the 10 ms
    signal floor (and inside VMEM), so the loop-differencing search can
    only fail after minutes of l_long-doubling recompiles; the smoke run
    records an explicit skip instead.  Full runs measure them all."""
    return {"skipped": "quick shapes are below the 10 ms signal floor"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--skip-elementwise", action="store_true")
    args = parser.parse_args()

    details = {"backend": jax.default_backend(), "devices": len(jax.devices())}
    err = sys.stderr

    if not args.skip_elementwise:
        for name, fn in [
            (
                "million_add",
                lambda: bench_million_add(100_000 if args.quick else 1_000_000),
            ),
            ("simple_check", bench_simple_check),
            (
                "pow_1d_int",
                lambda: bench_pow_small((10,), 3, 297, "1d"),
            ),
            (
                "pow_2d_int",
                lambda: bench_pow_small((3, 3), 2, 302, "2d"),
            ),
            ("tiny_chain_5op", lambda: bench_tiny_chain()),
            (
                "pallas_elementwise",
                lambda: _quick_skip() if args.quick
                else bench_elementwise_pallas(64 * 1024 * 1024),
            ),
            (
                "view_add",
                lambda: _quick_skip() if args.quick else bench_view_add(8192),
            ),
            ("pow_1000", lambda: bench_pow(100 if args.quick else 1000)),
            (
                "fused_pipeline",
                lambda: _quick_skip() if args.quick
                else bench_fused_pipeline(2048, ab_rounds=4),
            ),
            (
                "fused_pipeline_8k",
                lambda: _quick_skip() if args.quick
                else bench_fused_pipeline(8192, l_short=8, l_long=72),
            ),
            (
                "dot1d",
                lambda: bench_dot1d(1 << 20 if args.quick else 32 * 1024 * 1024),
            ),
            (
                "reduce_sum",
                lambda: bench_reduce_sum(
                    1 << 20 if args.quick else 64 * 1024 * 1024
                ),
            ),
            (
                "reduce_axis",
                lambda: _quick_skip() if args.quick else bench_reduce_axis(8192),
            ),
            (
                "fused_map_reduce",
                lambda: bench_fused_map_reduce(
                    1 << 20 if args.quick else 32 * 1024 * 1024
                ),
            ),
            (
                "small_pow_batched",
                lambda: bench_small_pow_batched(
                    10_000 if args.quick else 200_000
                ),
            ),
            (
                "matmul_bf16",
                lambda: bench_matmul(512 if args.quick else 2048, "bfloat16"),
            ),
            (
                "matmul_f32",
                lambda: bench_matmul(512 if args.quick else 2048, "float32"),
            ),
            (
                "matmul_epilogue",
                lambda: bench_matmul_epilogue(512 if args.quick else 2048),
            ),
            (
                "int8_matmul",
                lambda: bench_int8_matmul(512 if args.quick else 2048),
            ),
            (
                "bmm_bf16",
                lambda: bench_bmm(4 if args.quick else 8, 512 if args.quick else 1024),
            ),
            (
                "c64_matmul",
                lambda: bench_c64_matmul(512 if args.quick else 2048),
            ),
            ("pendulum", lambda: bench_pendulum(quick=args.quick)),
            ("quadrotor_replan", lambda: bench_quadrotor_replan()),
            (
                "long_horizon",
                lambda: bench_long_horizon(
                    batch=64 if args.quick else 512,
                    horizon=200 if args.quick else 1000,
                ),
            ),
            (
                "horizon_crossover",
                lambda: bench_horizon_crossover(
                    horizons=(256, 1024) if args.quick else (1024, 4096, 16384)
                ),
            ),
            ("sharded_overhead", lambda: bench_sharded_overhead()),
            ("sharding_overhead_8dev_proxy", bench_sharding_overhead_proxy),
        ]:
            try:
                details[name] = fn()
                print(f"{name}: {details[name]}", file=err)
            except MeasurementError as e:
                # Record the failure explicitly — a row must never carry a
                # number derived from a no-signal measurement.
                details[name] = {"error": str(e)}
                print(f"{name} failed: {e}", file=err)
            except Exception as e:  # pragma: no cover
                details[name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"{name} failed: {e}", file=err)

    # The headline row must always emit its JSON line, even on a flaky
    # device tunnel: retry with backoff before giving up.
    last_exc = None
    for attempt in range(3):
        try:
            cart = bench_cartpole(quick=args.quick)
            break
        except Exception as e:  # pragma: no cover
            last_exc = e
            print(f"cartpole attempt {attempt + 1} failed: {e}", file=err)
            if attempt < 2:  # no point sleeping after the final attempt
                time.sleep(30 * (attempt + 1))
    else:  # pragma: no cover
        raise last_exc
    details["cartpole"] = cart
    print(f"cartpole: {cart}", file=err)

    # --quick runs small shapes whose numbers are not comparable to the
    # full artifact; keep them out of bench_details.json so committed
    # claims (tools/check_claims.py) always diff against a FULL run.
    out_name = "bench_details_quick.json" if args.quick else "bench_details.json"
    with open(out_name, "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "cartpole_ilqr_solves_per_s_per_chip",
                "value": round(cart["solves_per_s"], 2),
                "unit": "solves/s",
                "vs_baseline": round(cart["vs_target_10k"], 4),
            }
        )
    )


if __name__ == "__main__":
    main()

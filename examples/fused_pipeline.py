"""Fused elementwise pipelines with sm.fuse.

The BASELINE configs[1] workload — a broadcast + pow + exp chain — as ONE
kernel launch.  Chained sm ops each cost a full HBM round trip (like the
reference's one-OpenMP-pass-per-op engine, include/math/calculate.h);
``sm.fuse`` composes their tile functions into a single Pallas launch.

Run: python examples/fused_pipeline.py  (any backend; CPU uses interpret mode)
"""

import jax
import jax.numpy as jnp

import simplemath_tpu as sm
from simplemath_tpu.ops import dispatch

n = 512
key_a, key_e = jax.random.split(jax.random.PRNGKey(0))
a = sm.Array(jax.random.uniform(key_a, (n, n), jnp.float32, 0.5, 2.0))
e_row = sm.Array(jax.random.uniform(key_e, (1, n), jnp.float32, -2.0, 2.0))

# One fused kernel: the (1, n) exponent row broadcasts inside the kernel via
# BlockSpec index maps — it is never materialized at (n, n).
pipeline = sm.fuse(lambda x, e: sm.exp(sm.pow(x, e)))

sm.configure(kernel_backend="pallas")  # force the kernel path for the demo
dispatch.reset()
y = pipeline(a, e_row)
print("launches:", {k: v for k, v in dispatch.counts().items()
                    if k.startswith("elementwise")})   # {'elementwise:fused': 1}

# The same chain WITHOUT sm.fuse: since round 4 the deferred-eager queue
# (ops/lazy.py) records the two eager calls and flushes them as one fused
# kernel at materialization — so this also costs ONE launch, at .jax() time.
dispatch.reset()
y_chain = sm.exp(sm.pow(a, e_row))
print("eager-chain launches before materialization:",
      {k: v for k, v in dispatch.counts().items()
       if k.startswith("elementwise")})                # {} — nothing ran yet
val = y_chain.jax()                                     # flush: ONE launch
print("eager-chain launches after materialization:",
      {k: v for k, v in dispatch.counts().items()
       if k.startswith("elementwise")})                # {'elementwise:fused': 1}

# With the queue disabled (SM_DEFERRED_EAGER=0) this chain is the round-3
# behavior: one launch per op (pow, exp) = 2x the HBM traffic.

print("max |fused - chain| =", float(jnp.max(jnp.abs(y.jax() - val))))

# Iterated recurrences run INSIDE one launch with the carry VMEM-resident:
ema = sm.fuse(lambda acc, x: acc * 0.9 + sm.square(x), iterations=50)
dispatch.reset()
z = ema(sm.zeros(n, n), a)
print("50-iteration recurrence launches:",
      {k: v for k, v in dispatch.counts().items()
       if k.startswith("elementwise")})                # {'elementwise:fused': 1}
print("ema[0,0] =", float(z[0, 0].jax()))

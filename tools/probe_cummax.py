"""Microbench: lax.cummax vs associative_scan vs hierarchical on (327680,) i32."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def _sync(o): np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])
def timeit(fn, *a, n=10, warmup=2):
    for _ in range(warmup): out = fn(*a)
    _sync(out); t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    _sync(out); return (time.perf_counter() - t0) / n, out

N = 327680
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-1, 500000, N).astype(np.int32))

f1 = jax.jit(lambda v: jax.lax.cummax(v))
f2 = jax.jit(lambda v: jax.lax.associative_scan(jnp.maximum, v))

def hier(v):
    L = 512
    rows = N // L
    m = v.reshape(rows, L)
    s = 1
    while s < L:
        shifted = jnp.pad(m, ((0, 0), (s, 0)), constant_values=-(2**31))[:, :L]
        m = jnp.maximum(m, shifted)
        s *= 2
    tot = m[:, -1]
    pref = jax.lax.associative_scan(jnp.maximum, tot)
    pref = jnp.pad(pref, (1, 0), constant_values=-(2**31))[:-1]
    return jnp.maximum(m, pref[:, None]).reshape(-1)

f3 = jax.jit(hier)
ref = np.maximum.accumulate(np.asarray(x))
for name, f in [("lax.cummax", f1), ("assoc_scan", f2), ("hier512", f3)]:
    t, out = timeit(f, x)
    ok = np.array_equal(np.asarray(out), ref)
    print(f"{name}: {t*1e3:7.3f} ms  correct={ok}", flush=True)

"""Full PCF chain timing (LUT build + gather + taps) at 4000^2, 2.09M px.

Round-3 recorded result (synthetic uniform positions, v5e-1):
  round-2 two-8x8-blocks-per-row LUT chain: 40.2 ms
  redesigned 8x16-stride-(4,8) LUT chain:   53.2 ms (bit-identical output)
The redesign lost because the pure-XLA build materializes 16x-padded
8-lane pieces (probe_lut_build.py: best XLA build 12.6 ms vs the MXU
lane-interleave kernel's 2.2 ms) — REVERTED; kept for the record."""
import importlib.util, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def _sync(o): np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])
def timeit(fn, *a, n=5, warmup=1):
    for _ in range(warmup): out = fn(*a)
    _sync(out); t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    _sync(out); return (time.perf_counter() - t0) / n, out

from arctic_tpu.ops import shadow as shadow_new

S = 4000
rng = np.random.default_rng(0)
smap = jnp.asarray(rng.random((S, S), dtype=np.float32))
x = jnp.asarray(rng.uniform(-0.9, 0.9, (2040, 1024)).astype(np.float32))
y = jnp.asarray(rng.uniform(-0.9, 0.9, (2040, 1024)).astype(np.float32))
z = jnp.asarray(np.full((2040, 1024), 0.5, np.float32))

t, _ = timeit(jax.jit(lambda m,a,b,c: shadow_new.pcf_shadow_proj(m,a,b,c,use_lut=True)), smap, x, y, z)
print(f"pcf chain: {t*1e3:8.2f} ms", flush=True)

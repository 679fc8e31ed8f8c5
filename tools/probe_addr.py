"""Probe: does the gather tier depend on the operand's HBM address?

Allocates 0-9.6 GB of device ballast FIRST, then the 92 MB table, then
measures the 2.09M-row gather. Result (2026-08-21, v5e via axon):
**1.80 ns/row at every offset** — flat with 9.6 GB allocated before the
table. Together with probe_mem_pressure (flat to 3.7 GB resident after)
this rules out allocation address and total residency as causes of the
in-frame slow-gather instances (docs/FLOORS.md).

Usage: python tools/probe_addr.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from tools.probe_pair_gather import trace_op_times

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
pix = 2088960
rows = 92 * 1024 * 1024 // 512
zeros = jax.jit(lambda n: jnp.zeros((n,), jnp.float32), static_argnums=0)
gather = jax.jit(lambda t, i: t[i])

def t_ns(label, table, idx):
    times = trace_op_times(gather, (table, idx))
    tot = sum(ms for name, ms in times.items()
              if any(k in name.lower() for k in ("gather", "fusion", "dynamic")))
    print(f"{label:46s} {tot:7.3f} ms  {tot*1e6/pix:6.2f} ns/row", flush=True)

mk_table = jax.jit(lambda key: jax.random.randint(key, (rows, 128), 0, 2**31-1, jnp.int32))
mk_idx = jax.jit(lambda key: jax.random.randint(key, (pix,), 0, rows, jnp.int32))
k = jax.random.PRNGKey(0)

# ballast FIRST, then allocate the table (pushes the table to high addresses)
for nmb in (0, 600, 1200, 2400, 4800, 9600):
    ballast = zeros(nmb * 1024 * 1024 // 4) if nmb else None
    if ballast is not None: jax.block_until_ready(ballast)
    table = mk_table(k); idx = mk_idx(k)
    jax.block_until_ready((table, idx))
    t_ns(f"table allocated AFTER {nmb/1000:4.1f} GB ballast", table, idx)
    del table, idx, ballast

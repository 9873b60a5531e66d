"""One-off: isolate host<->device transfer costs by shape/dtype on this rig.

Pitfalls this version avoids:
- jax caches the host copy after the first np.asarray -> time only the first
  materialization of a FRESH output (new seed each rep).
- device_put's block_until_ready does not force the wire transfer on this
  tunneled backend -> always force uploads through a consuming jit call.
"""
import time, sys, os
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)
rng = np.random.default_rng(0)

# ---------------- uploads (forced through a consuming jit call)
ri = rng.uniform(0, 60, (32, 64, 2000)).astype(np.float32)
ri_flat = np.ascontiguousarray(ri.reshape(-1))
ri_u16 = (ri * 500).astype(np.uint16)
ri_u16_flat = np.ascontiguousarray(ri_u16.reshape(-1))
ri_u8 = (ri * 2).astype(np.uint8)

@jax.jit
def g2d(x):
    return x.astype(jnp.float32).sum(axis=(1, 2))

@jax.jit
def g1d(x):
    return x.astype(jnp.float32).reshape(32, 64, 2000).sum(axis=(1, 2))

def t_call(label, fn, arg, n=4):
    fn(arg).block_until_ready()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn(arg).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    mb = arg.nbytes / 1e6
    print(f"up   {label:36s} {best*1000:8.1f} ms  {mb/best:8.1f} MB/s", flush=True)

t_call("f32 (32,64,2000)", g2d, ri)
t_call("f32 (4096000,) flat", g1d, ri_flat)
t_call("u16 (32,64,2000)", g2d, ri_u16)
t_call("u16 (2048000,) flat", g1d, ri_u16_flat)
t_call("u8  (32,64,2000)", g2d, ri_u8)

# ---------------- downloads (fresh output per rep, first asarray only)
@jax.jit
def make(seed):
    k = jax.random.PRNGKey(seed)
    v = jax.random.randint(k, (32, 98304), -300, 300, jnp.int32)
    return (
        v.astype(jnp.int16),
        v.reshape(-1).astype(jnp.int16),
        v.astype(jnp.int8),
        v.astype(jnp.float32),
    )

def t_down(label, idx, n=4):
    best = 1e9
    for s in range(n):
        outs = make(np.uint32(s))
        x = outs[idx]
        x.block_until_ready()
        t0 = time.perf_counter()
        a = np.asarray(x)
        best = min(best, time.perf_counter() - t0)
    mb = a.nbytes / 1e6
    print(f"down {label:36s} {best*1000:8.1f} ms  {mb/best:8.1f} MB/s", flush=True)

t_down("(32,98304) i16", 0)
t_down("(3145728,) i16 flat", 1)
t_down("(32,98304) i8", 2)
t_down("(32,98304) f32", 3)

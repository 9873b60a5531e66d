"""One-off: do async device->host copies and uploads overlap host compute on
this tunneled backend?"""
import time, sys, os
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)


@jax.jit
def make(seed):
    k = jax.random.PRNGKey(seed)
    return jax.random.randint(k, (32, 98304), -300, 300, jnp.int32).astype(jnp.int16)


def busy(ms):
    t0 = time.perf_counter()
    x = 1.0
    while (time.perf_counter() - t0) * 1000 < ms:
        x = x * 1.0000001 + 1e-9
    return x


def t_down_after_busy(busy_ms, use_async, n=3):
    best = 1e9
    for s in range(n):
        x = make(np.uint32(s + (100 if use_async else 0)))
        x.block_until_ready()
        t0 = time.perf_counter()
        if use_async:
            x.copy_to_host_async()
        busy(busy_ms)
        t_mid = time.perf_counter()
        a = np.asarray(x)
        dt_asarray = time.perf_counter() - t_mid
        best = min(best, dt_asarray)
    print(
        f"down 6.3MB after {busy_ms:4.0f}ms busy, async={use_async}: "
        f"asarray {best*1000:8.1f} ms", flush=True,
    )


t_down_after_busy(0, False)
t_down_after_busy(0, True)
t_down_after_busy(200, True)
t_down_after_busy(400, True)

# upload overlap: dispatch consuming call with fresh numpy, then busy-wait,
# then block — does the transfer progress during the busy loop?
@jax.jit
def consume(x):
    return x.astype(jnp.float32).sum()


rng = np.random.default_rng(0)


def t_up_after_busy(busy_ms, n=3):
    best = 1e9
    for s in range(n):
        arr = rng.uniform(0, 60, (32, 64, 2000)).astype(np.float32)  # fresh content
        t0 = time.perf_counter()
        y = consume(arr)
        t_disp = time.perf_counter() - t0
        busy(busy_ms)
        t_mid = time.perf_counter()
        y.block_until_ready()
        dt_block = time.perf_counter() - t_mid
        best = min(best, dt_block)
    print(
        f"up 16.4MB fresh: dispatch {t_disp*1000:6.1f} ms, busy {busy_ms:4.0f}ms, "
        f"then block {best*1000:8.1f} ms", flush=True,
    )


t_up_after_busy(0)
t_up_after_busy(200)
t_up_after_busy(400)

import os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np, jax, jax.numpy as jnp
from rpcc_tpu.ops.rans_device import _RECIP_NP, recip_from_freq
print("backend:", jax.default_backend())
f = jnp.arange(_RECIP_NP.size, dtype=jnp.uint32)
got = np.asarray(jax.jit(recip_from_freq)(f))
bad = np.nonzero(got != _RECIP_NP)[0]
print("mismatches:", bad.size, bad[:10], flush=True)
assert bad.size == 0
print("TPU recip exhaustive: OK")

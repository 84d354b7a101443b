"""Sharded cascade-biquad equivalence: 8-dev timeline shard vs single."""
import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
from termdaw_tpu.ops.filters import biquad_apply, biquad_coefs, biquad_init_state

ndev = len(jax.devices())
assert ndev >= 8, ndev
mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
rng = np.random.default_rng(5)
T = 8 * 4096
x = rng.normal(size=(T, 4)).astype(np.float32)
coefs = biquad_coefs("highpass", 120.0, 48000)
coefs = tuple(jnp.asarray([c, c, c, c], jnp.float32) for c in coefs)
st0 = biquad_init_state(4) + jnp.asarray(rng.normal(size=(4, 4)) * 0.1, jnp.float32)

y_single, s_single = jax.jit(lambda x, s: biquad_apply(x, coefs, s))(jnp.asarray(x), st0)

def body(xs, s):
    y, s2 = biquad_apply(xs, coefs, s, axis_name="t")
    return y, s2

f = shard_map(body, mesh=mesh, in_specs=(P("t", None), P()), out_specs=(P("t", None), P()), check_vma=False)
y_shard, s_shard = jax.jit(f)(jnp.asarray(x), st0)
err = float(np.max(np.abs(np.asarray(y_shard) - np.asarray(y_single))))
serr = float(np.max(np.abs(np.asarray(s_shard) - np.asarray(s_single))))
scale = float(np.max(np.abs(np.asarray(y_single))))
print(f"sharded-vs-single: y err {err:.2e} (scale {scale:.2f}), state err {serr:.2e}")
assert err / scale < 1e-4 and serr < 1e-3
print("OK")

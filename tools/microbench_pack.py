import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, numpy as np, jax, jax.numpy as jnp
import ectrans_tpu as et
from ectrans_tpu.ops import layout, pack_pallas

res = et.setup('TCO1279')
tables = res.device_tables(jnp.float32)
plan = pack_pallas.plan_for(res)
rng = np.random.default_rng(7)
nfld = 10
dense = jnp.asarray(rng.standard_normal((nfld, 2, res.M, res.NP)), jnp.float32)
dense = dense * tables.dense_valid

@jax.jit
def f_gather(x, tables):
    return layout.dense_to_packed(x, tables)

@jax.jit
def f_kernel(x, plan):
    return pack_pallas.dense_to_packed(x, plan)

want = np.asarray(f_gather(dense, tables))
got = np.asarray(f_kernel(dense, plan))
print('exact:', np.array_equal(got, want), 'maxdiff:', float(np.abs(got-want).max()), flush=True)

def chain(fn, x, extra, iters=8):
    @jax.jit
    def step(d, x, extra):
        out = fn(x + d.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), extra)
        return jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30)
    d = jnp.zeros((), jnp.float32)
    d = step(d, x, extra); np.asarray(d)
    t0 = time.perf_counter()
    for _ in range(iters):
        d = step(d, x, extra)
    np.asarray(d)
    return (time.perf_counter()-t0)/iters

tg = chain(lambda x, t: layout.dense_to_packed(x, t), dense, tables)
tk = chain(lambda x, p: pack_pallas.dense_to_packed(x, p), dense, plan)
print(f'gather {tg*1e3:.2f} ms   kernel {tk*1e3:.2f} ms', flush=True)

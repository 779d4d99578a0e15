import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import ectrans_tpu as et
from ectrans_tpu.parallel import ShardedTransform, make_mesh
from ectrans_tpu.transform import InvFlags

NUV, NSC, ITERS = 2, 6, 6
res = et.setup("TCO639")
rng = np.random.default_rng(0)
def packed(n):
    x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
    x[:, 1:2*(res.nsmax+1):2] = 0.0; x[:, 0] = 0.0
    return jnp.asarray(x)
spvor, spdiv, spsc = packed(NUV), packed(NUV), packed(NSC)
flags = InvFlags(scders=True, uvders=True)

def chain(fn, args, label):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(leaf.ravel()[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    dt = max(0.0, time.perf_counter() - t0 - rtt) / ITERS
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt

grid_s = et.inv_trans(res, spvor=spvor, spdiv=spdiv, spscalar=spsc, flags=flags)
u, v, sc = grid_s[0:NUV], grid_s[NUV:2*NUV], grid_s[2*NUV:2*NUV+NSC]
chain(lambda a,b,c: et.inv_trans(res, spvor=a, spdiv=b, spscalar=c, flags=flags),
      (spvor, spdiv, spsc), "single inv")
chain(lambda a,b,c: et.dir_trans(res, u=a, v=b, scalars=c), (u, v, sc), "single dir")

st = ShardedTransform(res, make_mesh(1, 1), dtype=jnp.float32)
print("sharded engine:", st.eng, flush=True)
chain(lambda a,b,c: st.inv_trans(spvor=a, spdiv=b, spscalar=c, flags=flags),
      (spvor, spdiv, spsc), "sharded inv")
chain(lambda a,b,c: st.dir_trans(u=a, v=b, scalars=c), (u, v, sc), "sharded dir")

"""On-chip sharded-vs-single correctness localization: compares the
inverse and direct transforms separately at mesh-(1,1), printing per-phase
and per-output max relative deltas.  Created while chasing the round-5
sharded on-chip mismatch (evidence/r5_sharded_overhead3.log)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NFLD_SC, NFLD_UV = 6, 2


def main():
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.parallel import ShardedTransform, make_mesh
    from ectrans_tpu.transform import InvFlags

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO639"
    res = et.setup(config)
    print(f"{config}: T{res.nsmax} ndgl {res.ndgl} eng check", flush=True)
    rng = np.random.default_rng(0)

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return jnp.asarray(x)

    spvor, spdiv, spsc = packed(NFLD_UV), packed(NFLD_UV), packed(NFLD_SC)
    flags = InvFlags(scders=True, uvders=True)

    st = ShardedTransform(res, make_mesh(1, 1), dtype=jnp.float32)
    print(f"sharded engine: {st.eng}", flush=True)

    # --- inverse ---
    g_ref = np.asarray(et.inv_trans(res, spvor=spvor, spdiv=spdiv,
                                    spscalar=spsc, flags=flags))
    g_sh = np.asarray(st.inv_trans(spvor=spvor, spdiv=spdiv,
                                   spscalar=spsc, flags=flags))
    scale = np.abs(g_ref).max()
    d = np.abs(g_sh - g_ref).max() / scale
    print(f"inv max rel delta: {d:.3e}", flush=True)
    # per-field-block attribution (u, v, sc, nsders, ew ders layout)
    nf = g_ref.shape[0]
    per = [float(np.abs(g_sh[i] - g_ref[i]).max() /
                 max(np.abs(g_ref[i]).max(), 1e-30)) for i in range(nf)]
    print("inv per-field rel deltas: "
          + " ".join(f"{x:.1e}" for x in per), flush=True)

    # --- direct (feed the SINGLE-device grid to both, isolating dir) ---
    u = jnp.asarray(g_ref[0:NFLD_UV])
    v = jnp.asarray(g_ref[NFLD_UV : 2 * NFLD_UV])
    sc = jnp.asarray(g_ref[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC])
    ref = [np.asarray(x) for x in et.dir_trans(res, u=u, v=v, scalars=sc)]
    got = [np.asarray(x) for x in st.dir_trans(u=u, v=v, scalars=sc)]
    for name, r, g in zip(("vor", "div", "sc"), ref, got):
        d = np.abs(g - r).max() / max(np.abs(r).max(), 1e-30)
        print(f"dir {name} max rel delta: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()

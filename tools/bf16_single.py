"""One-variant bf16-tier roundtrip error check (checkpointed).

tools/err_attrib.py with ECTRANS_ERR_TIER=bf16 at TCO639 has now crashed
the TPU worker in BOTH round 4 and round 5 (UNAVAILABLE kernel fault on
the first variant).  This runner executes exactly ONE variant per
process, prints per-family errors immediately, and exits — so a crash
voids one measurement, not four, and the crash itself is attributable to
a single configuration.

Usage:  ECTRANS_ERR_TIER=bf16 python tools/bf16_single.py TCO639 device dense
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ectrans_tpu as et
    from err_attrib import roundtrip_err

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO639"
    src = sys.argv[2] if len(sys.argv) > 2 else "device"
    eng = sys.argv[3] if len(sys.argv) > 3 else "dense"
    res = et.setup(config)
    print(f"{config}: T{res.nsmax} ndgl {res.ndgl} "
          f"tier={os.environ.get('ECTRANS_ERR_TIER', 'highest')}", flush=True)
    roundtrip_err(res, (src, eng))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

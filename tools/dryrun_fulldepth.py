"""Full-depth multichip dryrun evidence (VERDICT r4 item 7).

Runs `__graft_entry__.dryrun_multichip` at the REAL flagship depth
(enc 6 / dec 6) on a virtual 8-device CPU mesh — the same 2D dp x tp +
ZeRO-1 layout the driver's 1+1-layer dryrun validates — so the committed
multichip evidence covers the production model's sharding, not a
stand-in. Writes MULTICHIP_FULLDEPTH_r05.json at the repo root.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dryrun_fulldepth.py
"""

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from __graft_entry__ import dryrun_multichip

    t0 = time.time()
    buf = io.StringIO()
    ok, err = True, None
    try:
        with redirect_stdout(buf):
            dryrun_multichip(n, enc_layers=6, dec_layers=6)
    except Exception as e:  # noqa: BLE001 — evidence file must record failure
        ok, err = False, f"{type(e).__name__}: {e}"
    wall = round(time.time() - t0, 1)
    out = {"ok": ok, "n_devices": n, "enc_layers": 6, "dec_layers": 6,
           "wall_s": wall, "stdout": buf.getvalue().strip()}
    if err:
        out["error"] = err
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_FULLDEPTH_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(buf.getvalue())
    print(f"wrote {path} (ok={ok}, {wall}s)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

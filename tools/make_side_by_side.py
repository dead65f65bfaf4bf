"""Qualitative side-by-side: our demo outputs vs the reference's committed
expected outputs (VERDICT r4 next #10).

The reference commits expected demo images (sample_data/imgs/*_output.png,
readme.md:78-134) produced by its released checkpoint; ours come from the
from-scratch flagship (checkpoints/flagship.npz) — DIFFERENT WEIGHTS, so
the comparison is qualitative (same workflow, same pairs, same rendering),
not a pixel-match. Composites land in docs/side_by_side/ and are linked
from README.md.

  python tools/make_side_by_side.py
"""

import os
import sys

import numpy as np
import PIL.Image
import PIL.ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/sample_data/imgs"
OURS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "demos")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "side_by_side")

# our golden -> reference expected output (readme.md:78-134)
PAIRS = [
    ("demo_single_pair.png", "sparse_output.png", "demo_single_pair"),
    ("demo_face.png", "face_output.png", "demo_face"),
    ("demo_homography.png", "paint_output.png", "demo_homography"),
    ("demo_guided_matching.png", "guided_matching_output.png",
     "demo_guided_matching"),
    ("demo_reconstruction.png", "recon_output.png", "demo_reconstruction"),
]


def labeled(img: PIL.Image.Image, label: str, height: int) -> np.ndarray:
    w = int(round(img.width * height / img.height))
    img = img.convert("RGB").resize((w, height), PIL.Image.BILINEAR)
    bar = PIL.Image.new("RGB", (w, 22), (24, 24, 24))
    d = PIL.ImageDraw.Draw(bar)
    d.text((6, 4), label, fill=(240, 240, 240))
    canvas = PIL.Image.new("RGB", (w, height + 22))
    canvas.paste(bar, (0, 0))
    canvas.paste(img, (0, 22))
    return np.asarray(canvas)


def main():
    os.makedirs(OUT, exist_ok=True)
    made = []
    for ours_name, ref_name, title in PAIRS:
        op, rp = os.path.join(OURS, ours_name), os.path.join(REF, ref_name)
        if not (os.path.exists(op) and os.path.exists(rp)):
            print(f"skip {title}: missing {op if not os.path.exists(op) else rp}")
            continue
        h = 360
        left = labeled(PIL.Image.open(op),
                       f"{title} — ours (from-scratch flagship)", h)
        right = labeled(PIL.Image.open(rp),
                        f"{title} — reference (released checkpoint)", h)
        gap = np.full((h + 22, 8, 3), 255, np.uint8)
        comp = np.concatenate([left, gap, right], axis=1)
        out_path = os.path.join(OUT, f"{title}.png")
        PIL.Image.fromarray(comp).save(out_path)
        made.append(out_path)
        print(f"wrote {out_path}")
    print(f"{len(made)} composites")


if __name__ == "__main__":
    main()

"""Emit a shell script that rectifies MegaDepth COLMAP models to PINHOLE.

Reference scripts/rectify_megadepth.py:6-9,291-299: for each scene/sequence,
run the external COLMAP binary's image_undistorter then model_converter to
ASCII, then re-order images.txt to the original image-id order
(sort_images_txt.py). The COLMAP binary itself is an external tool; this
script only generates the commands.

Usage: python scripts/rectify_megadepth.py --megadepth_root /data/megadepth \
    --out rectify_all.sh
"""

import argparse
import glob
import os


def emit_commands(root: str):
    cmds = []
    for sparse_dir in sorted(glob.glob(
            os.path.join(root, "*", "sparse", "manhattan", "*"))):
        scene = sparse_dir.split(os.sep)[-4]
        seq = os.path.basename(sparse_dir)
        base = os.path.join(root, scene)
        img_dir = os.path.join(base, f"dense{seq}", "imgs")
        out_dir = os.path.join(base, f"rectified{seq}")
        cmds.append(
            f"colmap image_undistorter --image_path {img_dir} "
            f"--input_path {sparse_dir} --output_path {out_dir} "
            f"--output_type COLMAP")
        cmds.append(
            f"colmap model_converter --input_path {out_dir}/sparse "
            f"--output_path {out_dir}/sparse --output_type TXT")
        cmds.append(
            f"python scripts/sort_images_txt.py "
            f"--images_txt {out_dir}/sparse/images.txt "
            f"--reference {sparse_dir}/images.txt")
    return cmds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--megadepth_root", required=True)
    ap.add_argument("--out", default="rectify_all.sh")
    args = ap.parse_args()
    cmds = emit_commands(args.megadepth_root)
    with open(args.out, "w") as f:
        f.write("#!/bin/sh\nset -e\n")
        f.write("\n".join(cmds) + "\n")
    os.chmod(args.out, 0o755)
    print(f"wrote {args.out} ({len(cmds)} commands)")


if __name__ == "__main__":
    main()

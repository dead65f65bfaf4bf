"""Build the MegaDepth valid-image list, excluding semantic-ordinal depth.

Reference scripts/prepare_megadepth_valid_list.py:18-32: any image whose .h5
depth contains negative values is a semantic-ordinal map (unusable as metric
depth) and is filtered out; surviving images are stored as paths relative to
the dataset root (4 levels above the image file).

Usage: python scripts/prepare_megadepth_valid_list.py \
    --image_glob '/data/megadepth/*/dense*/imgs/*' \
    --out megadepth_valid_list.json
"""

import argparse
import glob
import json
import os

import h5py
import numpy as np


def filter_semantic_depth(imgs):
    valid = []
    for item in imgs:
        f_name = os.path.splitext(os.path.basename(item))[0] + ".h5"
        depth_dir = os.path.abspath(
            os.path.join(os.path.dirname(item), "../depths"))
        depth_path = os.path.join(depth_dir, f_name)
        if not os.path.isfile(depth_path):
            continue
        with h5py.File(depth_path, "r") as f:
            depth = np.asarray(f["depth"])
        if depth.min() >= 0:
            prefix = os.path.abspath(os.path.join(item, "../../../../")) + "/"
            valid.append(item.replace(prefix, ""))
    return sorted(valid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_glob", required=True)
    ap.add_argument("--out", default="megadepth_valid_list.json")
    args = ap.parse_args()
    imgs = sorted(glob.glob(args.image_glob))
    print(f"{len(imgs)} candidate images")
    valid = filter_semantic_depth(imgs)
    print(f"{len(valid)} images with metric depth")
    with open(args.out, "w") as f:
        json.dump(valid, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

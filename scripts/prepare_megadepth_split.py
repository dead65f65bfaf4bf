"""Scene-level MegaDepth train/val/test splits.

Reference scripts/prepare_megadepth_split.py:22-28: scenes <= 0240 train
(except 0204 which is validation), the rest test. Scene id = first 4 chars of
the dataset-relative image path.

Usage: python scripts/prepare_megadepth_split.py \
    --valid_list megadepth_valid_list.json --out_dir splits/
"""

import argparse
import json
import os


def split_by_scene(valid_list):
    by_scene = {}
    for item in valid_list:
        by_scene.setdefault(item[:4], []).append(item)
    train, val, test = [], [], []
    for k in sorted(by_scene):
        if int(k) == 204:
            val += by_scene[k]
        elif int(k) <= 240:
            train += by_scene[k]
        else:
            test += by_scene[k]
    return train, val, test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--valid_list", required=True)
    ap.add_argument("--out_dir", default=".")
    args = ap.parse_args()
    with open(args.valid_list) as f:
        valid = json.load(f)
    train, val, test = split_by_scene(valid)
    os.makedirs(args.out_dir, exist_ok=True)
    for name, data in [("train", train), ("val", val), ("test", test)]:
        path = os.path.join(args.out_dir, f"megadepth_{name}.json")
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"{name}: {len(data)} images -> {path}")


if __name__ == "__main__":
    main()

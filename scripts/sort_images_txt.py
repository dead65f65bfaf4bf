"""Re-order a rectified images.txt to match a reference model's image-id
order (reference scripts/sort_images_txt.py:62-69): COLMAP's undistorter
shuffles image order; downstream code assumes stable ordering.
"""

import argparse


def read_entries(path):
    with open(path) as f:
        lines = f.readlines()
    header = [l for l in lines[:4] if l.startswith("#")]
    body = lines[len(header):]
    entries = {}
    i = 0
    while i < len(body):
        meta = body[i].strip()
        if not meta:
            i += 1
            continue
        image_id = int(meta.split()[0])
        points = body[i + 1] if i + 1 < len(body) else "\n"
        entries[image_id] = (body[i], points)
        i += 2
    return header, entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_txt", required=True)
    ap.add_argument("--reference", required=True,
                    help="images.txt whose image-id order to replicate")
    args = ap.parse_args()

    header, entries = read_entries(args.images_txt)
    _, ref_entries = read_entries(args.reference)
    order = [iid for iid in ref_entries if iid in entries]
    missing = set(entries) - set(order)
    order += sorted(missing)

    with open(args.images_txt, "w") as f:
        f.writelines(header)
        for iid in order:
            meta, pts = entries[iid]
            f.write(meta)
            f.write(pts)
    print(f"re-ordered {len(order)} images in {args.images_txt}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Create shuffled 80/10/10 split JSONs from a mesh directory
(ref: utils/create_split_json_files.py:14-34)."""

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msd_tpu.data.splits import create_split_files  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh_dir", "-m", required=True)
    parser.add_argument("--out_dir", "-o", required=True)
    parser.add_argument("--prefix", "-p", default="split")
    parser.add_argument("--ext", default=".obj")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fractions", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    args = parser.parse_args()
    meshes = sorted(glob(os.path.join(args.mesh_dir, "*" + args.ext)))
    if not meshes:
        raise SystemExit(f"no {args.ext} files under {args.mesh_dir}")
    paths = create_split_files(meshes, args.out_dir, args.prefix, tuple(args.fractions), args.seed)
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()

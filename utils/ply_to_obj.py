#!/usr/bin/env python3
"""Batch-convert .ply meshes to .obj (ref: utils/ply_to_obj.py:16-32)."""

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msd_tpu.data.mesh_io import load_ply, save_obj  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", "-i", required=True)
    parser.add_argument("--output_dir", "-o", required=True)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    for ply in sorted(glob(os.path.join(args.input_dir, "*.ply"))):
        verts, faces = load_ply(ply)
        base = os.path.splitext(os.path.basename(ply))[0]
        out = os.path.join(args.output_dir, base + ".obj")
        save_obj(out, verts, faces if faces is not None else [])
        print(f"{ply} -> {out}")


if __name__ == "__main__":
    main()

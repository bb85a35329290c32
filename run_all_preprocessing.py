#!/usr/bin/env python3
"""Run preprocessing over every split JSON in a directory — CLI equivalent of
the reference's run_all_preprocessing.py (ref: run_all_preprocessing.py:1-72).
Produces training SDF samples, test-mode samples, and evaluation surface
samples per split."""

import argparse
import json
import logging
import os
import subprocess
import sys
import time

from msd_tpu.utils import add_common_args, configure_logging


def main(data_dir, source_dir, splits_dir, debug=False, include_surface=True):
    all_splits_paths = sorted(
        os.path.join(splits_dir, f) for f in os.listdir(splits_dir) if f.endswith(".json")
    )
    logging.info("Preprocessing data %s --> %s.", source_dir, data_dir)
    logging.info("Found these splits-files to preprocess:\n\t%s", "\n\t".join(all_splits_paths))

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "preprocess_data.py")
    for i, split_path in enumerate(all_splits_paths):
        start_time = time.time()
        with open(split_path) as f:
            num_shapes = len(json.load(f))
        logging.info(
            "[%d/%d] Preprocessing split: %s (containing %d shapes).",
            i, len(all_splits_paths), split_path, num_shapes,
        )
        base = [sys.executable, script, "--data_dir", data_dir, "--source", source_dir,
                "--split", split_path, "--skip"]
        cmds = [base, base + ["--test"]]
        if include_surface:
            cmds.append(base + ["--surface"])
        for cmd in cmds:
            if debug:
                logging.info("Running cmd: %s", " ".join(cmd))
            subprocess.run(cmd, capture_output=not debug, check=True)
        duration = time.time() - start_time
        logging.info(
            "Preprocessing %d shapes took %d:%04.1f (min:sec).",
            num_shapes, int(duration // 60), duration % 60,
        )


if __name__ == "__main__":
    arg_parser = argparse.ArgumentParser()
    arg_parser.add_argument("--data_dir", "-d", required=True)
    arg_parser.add_argument("--source", "-s", dest="source_dir", required=True)
    arg_parser.add_argument("--splits_dir", required=True)
    arg_parser.add_argument("--no_surface", action="store_true")
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    configure_logging(args)
    os.makedirs(args.data_dir, exist_ok=True)
    main(args.data_dir, args.source_dir, args.splits_dir,
         debug=args.debug, include_surface=not args.no_surface)

#!/usr/bin/env python3
"""Evaluate reconstructions (Chamfer vs GT surface samples) — CLI
compatible with the reference (ref: evaluate.py:100-158)."""

import argparse
import logging

from msd_tpu.eval_chamfer import evaluate
from msd_tpu.utils import add_common_args, configure_logging

from msd_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    arg_parser = argparse.ArgumentParser(description="Evaluate a DeepSDF autodecoder")
    arg_parser.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    arg_parser.add_argument("--checkpoint", "-c", dest="checkpoint", default="2000")
    arg_parser.add_argument("--data", "-d", dest="data_source", required=True)
    arg_parser.add_argument("--split", "-s", dest="split_filename", required=True)
    arg_parser.add_argument(
        "--curvature_sampling", "-cs", dest="curvature_sampling", default=0.0,
        help="0 = sample w.r.t. face area, 1 = w.r.t. face curvature.",
    )
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    configure_logging(args)

    try:
        curvature_sampling = float(args.curvature_sampling)
    except ValueError as ve:
        logging.error("Could not cast %s to float: %s", args.curvature_sampling, ve)
        raise SystemExit(1)
    evaluate(
        args.experiment_directory,
        args.checkpoint,
        args.data_source,
        args.split_filename,
        curvature_sampling,
    )

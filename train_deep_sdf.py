#!/usr/bin/env python3
"""Train a DeepSDF auto-decoder (Stage 1) — CLI-compatible with the
reference's train_deep_sdf.py (ref: train_deep_sdf.py:1083-1123)."""

import argparse

from msd_tpu.train.stage1 import main_function
from msd_tpu.utils import add_common_args, configure_logging

from msd_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    arg_parser = argparse.ArgumentParser(description="Train a DeepSDF autodecoder")
    arg_parser.add_argument(
        "--experiment",
        "-e",
        dest="experiment_directory",
        required=True,
        help="The experiment directory. This directory should include "
        "experiment specifications in 'specs.json', and logging will be "
        "done in this directory as well.",
    )
    arg_parser.add_argument(
        "--continue",
        "-c",
        dest="continue_from",
        help="A snapshot to continue from. This can be 'latest' to continue "
        "from the latest running snapshot, or an integer corresponding to "
        "an epochal snapshot.",
    )
    arg_parser.add_argument(
        "--batch_split",
        dest="batch_split",
        type=int,
        default=1,
        help="This splits the batch into separate subbatches which are "
        "processed separately, with gradients accumulated across all "
        "subbatches. This allows for training with large effective batch "
        "sizes in memory constrained environments.",
    )
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    configure_logging(args)
    main_function(args.experiment_directory, args.continue_from, args.batch_split)

#!/usr/bin/env python3
"""Train the Stage-2 disentanglement VAE over Stage-1 latent codes — CLI
compatible with the reference's train_MLP_VAE_deep_sdf.py (ref: :3916-3957)."""

import argparse

from msd_tpu.train.stage2 import main_function
from msd_tpu.utils import add_common_args, configure_logging
from msd_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    arg_parser = argparse.ArgumentParser(
        description="Train a VAE over DeepSDF latent codes with disentanglement losses"
    )
    arg_parser.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    arg_parser.add_argument("--continue", "-c", dest="continue_from")
    arg_parser.add_argument("--batch_split", dest="batch_split", type=int, default=1)
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    # default log file <exp>/train.log (ref: train_MLP_VAE_deep_sdf.py:3952-3953)
    if args.logfile is None:
        import os

        args.logfile = os.path.join(args.experiment_directory, "train.log")
        os.makedirs(args.experiment_directory, exist_ok=True)
    configure_logging(args)
    main_function(args.experiment_directory, args.continue_from, args.batch_split)

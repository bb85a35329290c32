from msd_tpu.utils.logging_utils import configure_logging, add_common_args  # noqa: F401

from msd_tpu.train.stage1 import Stage1Trainer, main_function  # noqa: F401

from msd_tpu.models.registry import build_decoder, register_arch, ARCH_REGISTRY  # noqa: F401
from msd_tpu.models.deepsdf import DeepSDFDecoder  # noqa: F401

"""Config-driven architecture registry.

The reference dynamically imports ``networks.<NetworkArch>`` and splats
``NetworkSpecs`` into its ``Decoder`` constructor
(ref: train_deep_sdf.py:225,348; deep_sdf/workspace.py:56-80). We keep the
same spec names so reference specs.json files work unchanged, dispatching to
the equivalent msd_tpu model classes.
"""

from __future__ import annotations

ARCH_REGISTRY = {}


def register_arch(name):
    def deco(fn):
        ARCH_REGISTRY[name] = fn
        return fn

    return deco


def build_decoder(arch_name: str, latent_size: int, network_specs: dict):
    """Equivalent of `arch.Decoder(latent_size, **specs["NetworkSpecs"])`."""
    if arch_name not in ARCH_REGISTRY:
        # late registration of optional architectures
        _register_builtin()
    if arch_name not in ARCH_REGISTRY:
        raise KeyError(
            f"unknown NetworkArch '{arch_name}' (known: {sorted(ARCH_REGISTRY)})"
        )
    return ARCH_REGISTRY[arch_name](latent_size, **network_specs)


def _register_builtin():
    from msd_tpu.models.deepsdf import DeepSDFDecoder

    ARCH_REGISTRY.setdefault(
        "deep_sdf_decoder", lambda latent_size, **kw: DeepSDFDecoder(latent_size, **kw)
    )
    try:
        from msd_tpu.models.siren import SirenDecoder

        ARCH_REGISTRY.setdefault(
            "siren_decoder", lambda latent_size, **kw: SirenDecoder(latent_size, **kw)
        )
    except ImportError:
        pass
    try:
        from msd_tpu.models.local_shapes import LocalShapesDecoder

        ARCH_REGISTRY.setdefault(
            "local_decoder", lambda latent_size, **kw: LocalShapesDecoder(latent_size, **kw)
        )
    except ImportError:
        pass


_register_builtin()

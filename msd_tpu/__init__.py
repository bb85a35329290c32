"""msd_tpu — TPU-native (JAX / XLA / Pallas) medical shape disentanglement framework.

A ground-up rebuild of the capabilities of the
``anonymous-submission01/medical-shape-disentanglement`` reference (a two-stage
PyTorch DeepSDF + disentanglement-VAE pipeline) designed for TPU hardware:

* Stage 1: DeepSDF auto-decoder training — a single jitted program updating
  {decoder params, per-shape latent table} with two Adam parameter groups,
  point batches sharded over a device mesh (ref: train_deep_sdf.py).
* Stage 2: residual MLP-VAE over Stage-1 latents with the full
  disentanglement-loss arsenal in one fused jitted step
  (ref: train_MLP_VAE_deep_sdf.py).
* Inference: per-shape latent optimization (`lax.scan` of jitted steps) and
  dense-grid SDF evaluation through a Pallas fused-MLP kernel feeding
  marching cubes (ref: reconstruct.py, deep_sdf/mesh.py).
* Preprocessing: mesh → SDF sample generation as JAX kernels (area-weighted
  surface sampling + kNN normal-vote signing), emitting the reference's
  `.npz` {pos, neg} SdfSamples layout (ref: src/PreprocessMesh.cpp).

File contracts (specs.json keys, experiment-directory layout, split JSONs,
checkpoint formats, .ply outputs) are kept compatible with the reference so
data, configs, and tooling interoperate.
"""

__version__ = "0.1.0"

from msd_tpu import workspace  # noqa: F401
from msd_tpu import config  # noqa: F401
from msd_tpu import lr_schedules  # noqa: F401

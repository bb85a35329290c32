"""Pallas TPU fused decoder MLP for the SDF-query hot path.

The reference evaluates its 8x512 decoder as 9 separate matmuls; at 2^18
points per chunk each intermediate activation (512 x 2^18 x 4B = 512 MB)
round-trips through HBM, so the unfused path pays ~9 GB of HBM traffic per
chunk on top of ~1 TFLOP of compute (ref: deep_sdf/mesh.py:57-68 +
networks/deep_sdf_decoder.py:84-109). This kernel keeps ALL layer weights
(~3.7 MB bf16) and the activation tile resident in VMEM, so HBM traffic is
just xyz in (12 B/point) and sdf out (4 B/point) — the kernel is purely
MXU-compute-bound.

Layout trick: activations are stored transposed, [features, points], so the
point axis is the 128-wide lane dimension and every layer is one
[out, in] @ [in, T] MXU matmul.

Latent trick: during grid evaluation / latent optimization the latent code
is CONSTANT across points, so each layer's latent contribution
(z @ W_z + b) is precomputed outside the kernel into a per-layer bias
column — layer 0 collapses from a 515-wide to a 3-wide matmul.

Supported decoder configs: any DeepSDFDecoder without xyz_in_all whose
weights fit in VMEM (latent_in re-injection and LayerNorm are handled;
dropout is inference-off). Unsupported configs fall back to the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msd_tpu.models.common import weight_norm_effective


def _layer_weight(layer_params):
    if "v" in layer_params:
        return weight_norm_effective(layer_params)
    return layer_params["w"]


class FusedDecoderSpec:
    """Preprocessed per-layer weight splits for the fused kernel."""

    def __init__(self, decoder, params, dtype=jnp.bfloat16):
        self.decoder = decoder
        self.dtype = dtype
        L = decoder.latent_size
        n_layers = decoder.num_layers - 1
        if decoder.xyz_in_all:
            raise ValueError("fused kernel: xyz_in_all not supported")
        self.n_layers = n_layers
        self.use_tanh = decoder.use_tanh

        # Per layer: W_prev^T [out, in_prev] (None for layer 0),
        # W_xyz^T [out, 3] (layer 0 and latent_in layers), W_z [L, out]
        # (kept f32, applied to the latent outside the kernel), bias [out],
        # optional LayerNorm (scale, bias).
        self.w_prev_t = []
        self.w_xyz_t = []
        self.w_z = []
        self.bias = []
        self.ln = []
        vmem_bytes = 0
        for layer in range(n_layers):
            w = _layer_weight(params[f"lin{layer}"])  # [in, out]
            b = params[f"lin{layer}"]["b"]
            if layer == 0:
                w_z, w_xyz = w[:L], w[L:]
                w_prev = None
            elif layer in decoder.latent_in:
                in_prev = w.shape[0] - (L + 3)
                w_prev = w[:in_prev]
                w_z = w[in_prev : in_prev + L]
                w_xyz = w[in_prev + L :]
            else:
                w_prev, w_z, w_xyz = w, None, None
            self.w_prev_t.append(None if w_prev is None else jnp.asarray(w_prev.T, dtype))
            if w_xyz is None:
                self.w_xyz_t.append(None)
            else:
                # pad the 3 xyz columns to 8 to match the sublane-padded
                # [8, T] xyz tile (extra rows are zero -> no-op contribution)
                wx = jnp.zeros((w_xyz.shape[1], 8), dtype).at[:, :3].set(
                    jnp.asarray(w_xyz.T, dtype)
                )
                self.w_xyz_t.append(wx)
            self.w_z.append(None if w_z is None else jnp.asarray(w_z, jnp.float32))
            self.bias.append(jnp.asarray(b, jnp.float32))
            if f"bn{layer}" in params:
                self.ln.append(
                    (
                        jnp.asarray(params[f"bn{layer}"]["scale"], jnp.float32),
                        jnp.asarray(params[f"bn{layer}"]["bias"], jnp.float32),
                    )
                )
            else:
                self.ln.append(None)
            vmem_bytes += (w.size + b.size) * (2 if dtype == jnp.bfloat16 else 4)
        if vmem_bytes > 10 * 1024 * 1024:
            raise ValueError(f"fused kernel: weights too large for VMEM ({vmem_bytes} B)")

    def latent_consts(self, latent):
        """Per-layer [out, 1] f32 columns: z @ W_z + b (b folded in)."""
        latent = latent.reshape(-1).astype(jnp.float32)
        consts = []
        for layer in range(self.n_layers):
            c = self.bias[layer]
            if self.w_z[layer] is not None:
                c = c + latent @ self.w_z[layer]
            consts.append(c.reshape(-1, 1))
        return consts


def _fused_kernel_body(spec: FusedDecoderSpec, n_layers: int, refs):
    """refs: [xyz_ref, (w_prev?, w_xyz?, const, ln_scale?, ln_bias?) x layers, out_ref]"""
    xyz_ref = refs[0]
    out_ref = refs[-1]
    idx = 1
    xyz = xyz_ref[:]  # [3pad, T] — rows 3.. are zero padding
    h = None
    for layer in range(n_layers):
        acc = None
        if spec.w_prev_t[layer] is not None:
            wp = refs[idx][:]
            idx += 1
            acc = jax.lax.dot(
                wp, h.astype(spec.dtype), preferred_element_type=jnp.float32
            )
        if spec.w_xyz_t[layer] is not None:
            wx = refs[idx][:]
            idx += 1
            part = jax.lax.dot(
                wx, xyz.astype(spec.dtype), preferred_element_type=jnp.float32
            )
            acc = part if acc is None else acc + part
        const = refs[idx][:]  # [out, 1]
        idx += 1
        h = acc + const
        is_last = layer == n_layers - 1
        if is_last and spec.use_tanh:
            h = jnp.tanh(h)
        if not is_last:
            if spec.ln[layer] is not None:
                scale = refs[idx][:]
                bias = refs[idx + 1][:]
                idx += 2
                mean = jnp.mean(h, axis=0, keepdims=True)
                var = jnp.mean((h - mean) ** 2, axis=0, keepdims=True)
                h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
                h = h * scale + bias
            h = jnp.maximum(h, 0.0)
    # final tanh always (deep_sdf_decoder.py:106-107); broadcast [1,T] result
    # into the sublane-padded [8,T] output block
    out_ref[:] = jnp.broadcast_to(jnp.tanh(h), out_ref.shape)


def build_fused_eval(decoder, params, dtype=jnp.bfloat16, tile: int = 2048, interpret: bool = False):
    """Returns fn(latent [L], xyz_t [3, N]) -> sdf [N] (N must be a multiple
    of ``tile``), or None when the config is unsupported or Pallas TPU is
    unavailable. ``interpret=True`` runs the kernel in the Pallas
    interpreter (for CPU tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        spec = FusedDecoderSpec(decoder, params, dtype)
    except ValueError:
        return None

    n_layers = spec.n_layers

    # assemble static input list (weights + per-layer consts + ln params)
    weight_inputs = []
    in_specs = [
        pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)  # xyz (padded rows)
    ]
    for layer in range(n_layers):
        if spec.w_prev_t[layer] is not None:
            weight_inputs.append(spec.w_prev_t[layer])
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if spec.w_xyz_t[layer] is not None:
            weight_inputs.append(spec.w_xyz_t[layer])
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        weight_inputs.append(None)  # placeholder: const filled per latent
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if spec.ln[layer] is not None:
            weight_inputs.append(spec.ln[layer][0].reshape(-1, 1))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            weight_inputs.append(spec.ln[layer][1].reshape(-1, 1))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_dim = 8  # padded sublane for the [1, T] result

    def kernel(*refs):
        _fused_kernel_body(spec, n_layers, refs)

    @jax.jit
    def fused(latent, xyz_t):
        n = xyz_t.shape[1]
        grid = n // tile
        consts = spec.latent_consts(latent)
        inputs = []
        ci = 0
        for w in weight_inputs:
            if w is None:
                inputs.append(consts[ci])
                ci += 1
            else:
                inputs.append(w)
        # pad xyz rows 3->8 for sublane alignment
        xyz_pad = jnp.zeros((8, n), xyz_t.dtype).at[:3].set(xyz_t)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((out_dim, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_dim, n), jnp.float32),
            interpret=interpret,
        )(xyz_pad, *inputs)
        return out[0]

    return fused


def fused_eval_points(decoder, params, latent, xyz, dtype=jnp.bfloat16, tile: int = 2048, interpret: bool = False):
    """Convenience: [N, 3] points -> [N] sdf via the fused kernel, padding N
    to a tile multiple. Returns None if unsupported."""
    fn = build_fused_eval(decoder, params, dtype, tile, interpret)
    if fn is None:
        return None
    n = xyz.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    xyz_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(jnp.asarray(xyz).T)
    out = fn(jnp.asarray(latent), xyz_t)
    return out[:n]

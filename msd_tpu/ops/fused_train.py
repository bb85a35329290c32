"""Pallas TPU fused forward+backward training kernel for the Stage-1 loss.

The Stage-1 hot loop differentiates clamped-L1 + eikonal through the
decoder (ref: train_deep_sdf.py:594-784). Under XLA autodiff this lowers
to ~5 chained matmul sweeps whose intermediates round-trip HBM; the
backward ran at ~34% of MXU peak (PERF.md §2). This kernel computes the
loss AND all parameter/latent gradients in ONE pass per 128-point tile
with every weight, activation, and f32 gradient accumulator resident in
VMEM.

Derivation (per point; relu'' = 0 a.e., matching JAX autodiff exactly):

  primal     a_i = W_i h_{i-1} (+ W_x x + c_i),  h_i = relu(a_i)
             y = tanh(a_last), yc = clip(y, ±δ), m = 1[|y|<δ], τ = 1−y²
  u-chain    u_last = m·τ;   u_{i-1} = D_{i-1} (W_iᵀ u_i),  D_i = 1[a_i>0]
  (∇xyz)     g = W_x0ᵀ u_0 + W_xLᵀ u_L   (xyz columns of layer 0 and the
             latent_in layer);  gn = ‖g‖;  eik = w_e · mean((1−gn)²)
  reverse    ḡ = (2 w_e/N_e)·(gn−1)/gn · g,   q̄ = m·τ·ḡ
             s̄ = m·τ·sign(yc−gt)/N_tot  −  2y·(ḡᵀg)      (τ-path folded)
  δ-chain    δ_last = s̄; standard reverse: dW_i += δa_i h_{i-1}ᵀ,
             dc_i += Σ δa_i,  dW_x += δa x ᵀ
  ū/t-chain  ū_0 = W_x0 q̄;  t_i = D_i ū_i;  ū_{i+1} = W_{i+1} t_i (+ W_xL q̄
             at the latent_in layer);  dW_{i+1} += u_{i+1} t_iᵀ,
             dW_x += u q̄ᵀ                         (second-order terms)

The latent enters only through per-scene bias columns c_i = z@Wz_i + b_i
(computed outside the kernel), so dz / db / dWz are recovered from the
per-scene dc accumulators by tiny XLA matmuls. Weight-norm (when active)
is handled by jax.vjp of the effective-weight map outside the kernel.

Supported configs (supports_fused_train): deep_sdf_decoder without
xyz_in_all / norm layers / pre-final tanh, ≤1 latent_in index not on the
last two layers, points-per-scene divisible by the 128-lane tile, no
active dropout. Everything else falls back to the XLA path
(Stage1Trainer dispatches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from msd_tpu.models.common import weight_norm_effective

TILE = 128          # minimum lane tile; actual tile set per build
_XPAD = 8  # xyz rows padded to the f32 sublane


def supports_fused_train(decoder, points_per_scene: int) -> bool:
    return (
        type(decoder).__name__ == "DeepSDFDecoder"
        and not decoder.xyz_in_all
        # weight-norm is fine (handled by vjp of the effective-weight map);
        # LayerNorm inside the chain is not
        and not any(has_ln for _, _, _, has_ln in decoder.layer_shapes)
        and not decoder.use_tanh
        and len(decoder.latent_in) <= 1
        and (not decoder.latent_in or 0 < decoder.latent_in[0] < decoder.num_layers - 2)
        and points_per_scene % TILE == 0
    )


def _layer_plan(decoder):
    """Static per-layer plan: (kind, prev_width, out_width)."""
    L = decoder.latent_size
    nl = decoder.num_layers - 1
    latent_in = decoder.latent_in[0] if decoder.latent_in else None
    plan = []
    for l in range(nl):
        in_dim, out_dim, _, _ = decoder.layer_shapes[l]
        if l == 0:
            plan.append(("first", None, out_dim))
        elif l == latent_in:
            plan.append(("latent", in_dim - (L + 3), out_dim))
        else:
            plan.append(("plain", in_dim, out_dim))
    return plan, latent_in, L, nl


def split_weights(decoder, weights):
    """weights: per-layer effective [in, out] matrices. Returns per-layer
    {Mp: [out, prev]|None, Mx: [out, 3]|None, Wz: [L, out]|None} (Mp/Mx
    transposed for the points-as-lanes kernel layout)."""
    plan, latent_in, L, nl = _layer_plan(decoder)
    parts = []
    for l, (kind, prev, out) in enumerate(plan):
        w = weights[l]
        if kind == "first":
            parts.append({"Mp": None, "Mx": w[L : L + 3].T, "Wz": w[:L]})
        elif kind == "latent":
            parts.append(
                {"Mp": w[:prev].T, "Mx": w[prev + L : prev + L + 3].T, "Wz": w[prev : prev + L]}
            )
        else:
            parts.append({"Mp": w.T, "Mx": None, "Wz": None})
    return parts


def _make_kernel(plan, latent_li, use_eikonal, dtype, tps, eik_tps=None,
                 want_wgrad=True, weighted=False):
    """Kernel body. Ref order:
    in:  xyz [8,T], gt [8,T], scal [1,4] SMEM,
         per layer: (Mp?, Mx?, c[1,out])
    out: loss_acc [8,128], per layer: (dMp?, dMx?, dc[1,out])
    scratch: h_0..h_{nl-2}, then (if eikonal) u_0..u_{nl-2},
    then (if eikonal is tile-gated) sbar_e carry [8, T]

    ``eik_tps``: eikonal is computed only on the first ``eik_tps`` of each
    scene's ``tps`` tiles (EikonalNumPoints subsampling — points arrive in
    freshly-sampled random order each step, so a tile prefix is an unbiased
    subsample). ``None`` / ``tps`` = every tile (full eikonal).

    ``want_wgrad=False`` (frozen decoder, the Stage-2 TrainSDFDecoder=false
    hot path): no dMp/dMx outputs exist and the δ-chain skips every weight
    outer product — only the per-scene dc accumulators (→ dlat through Wz)
    and the dgrad propagation remain, cutting the kernel from ~3 to ~2
    matmul sweeps. Requires use_eikonal=False (the ū/t chain is itself a
    weight-gradient computation).

    ``weighted=True``: gt row 1 carries a per-point weight w (0/1 for
    pad-and-mask mesh batches). The L1 and eikonal loss lanes and every
    gradient seed (s̄, ḡ) are scaled by w, so w=0 points contribute exactly
    zero to loss AND gradients; the caller supplies sum(w)-based
    normalizers. Static flag: the unweighted kernel is byte-identical to
    before.
    """
    from jax.experimental import pallas as pl

    nl = len(plan)
    if eik_tps is None:
        eik_tps = tps
    eik_gated = use_eikonal and eik_tps < tps
    assert want_wgrad or not use_eikonal

    def kernel(*refs):
        it = iter(refs)
        xyz_ref, gt_ref, scal_ref = next(it), next(it), next(it)
        lin = []
        for kind, prev, out in plan:
            e = {}
            if kind != "first":
                e["Mp"] = next(it)
            if kind in ("first", "latent"):
                e["Mx"] = next(it)
            e["c"] = next(it)
            lin.append(e)
        loss_ref = next(it)
        lout = []
        for kind, prev, out in plan:
            e = {}
            if want_wgrad and kind != "first":
                e["dMp"] = next(it)
            if want_wgrad and kind in ("first", "latent"):
                e["dMx"] = next(it)
            e["dc"] = next(it)
            lout.append(e)
        h_scr = [next(it) for _ in range(nl - 1)]
        u_scr = [next(it) for _ in range(nl - 1)] if use_eikonal else None
        sbar_scr = next(it) if eik_gated else None

        pid = pl.program_id(0)
        clamp = scal_ref[0, 0]
        inv_ntot = scal_ref[0, 1]
        eik_coef = scal_ref[0, 2]  # 2 * w_e / N_e

        @pl.when(pid == 0)
        def _init():
            loss_ref[:] = jnp.zeros_like(loss_ref)
            for l in range(nl):
                if "dMp" in lout[l]:
                    lout[l]["dMp"][:] = jnp.zeros_like(lout[l]["dMp"])
                if "dMx" in lout[l]:
                    lout[l]["dMx"][:] = jnp.zeros_like(lout[l]["dMx"])

        @pl.when(pid % tps == 0)
        def _init_scene():
            for l in range(nl):
                lout[l]["dc"][:] = jnp.zeros_like(lout[l]["dc"])

        x = xyz_ref[:]  # [8, T]; rows 3.. are zero
        x_c = x.astype(dtype)

        def mm(m, v):  # m @ v
            return jax.lax.dot(m, v, preferred_element_type=jnp.float32)

        def mmT(m_ref, v):  # m^T @ v (contract dim 0 of both)
            return jax.lax.dot_general(
                m_ref[:], v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        def outer(a, b):  # a [m,T] ⊗ b [n,T] -> [m,n]
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )

        # ---- primal ----
        h_prev = None
        a_last = None
        for l, (kind, prev, out) in enumerate(plan):
            c = lin[l]["c"][0].T  # block [1, 1, out] -> [out, 1]
            acc = None
            if "Mp" in lin[l]:
                acc = mm(lin[l]["Mp"][:], h_prev)
            if "Mx" in lin[l]:
                part = mm(lin[l]["Mx"][:], x_c)
                acc = part if acc is None else acc + part
            a = acc + c
            if l < nl - 1:
                h_scr[l][:] = jnp.maximum(a, 0.0).astype(dtype)
                h_prev = h_scr[l][:]
            else:
                a_last = a  # [8, T] (padded), row 0 valid

        row0 = (jax.lax.broadcasted_iota(jnp.int32, a_last.shape, 0) == 0).astype(jnp.float32)
        y = jnp.tanh(a_last) * row0
        tau = (1.0 - y * y) * row0
        m = (jnp.abs(y) < clamp).astype(jnp.float32) * row0

        gt = gt_ref[:] * row0  # row 0 = clipped gt (row 1 = weights if any)
        wrow = gt_ref[1:2] if weighted else None  # [1, T]
        yc = jnp.clip(y, -clamp, clamp)
        l1_lane = jnp.sum(jnp.abs(yc - gt) * row0, axis=0)  # [T]
        if weighted:
            l1_lane = l1_lane * wrow[0]
        sgn = jnp.sign(yc - gt)

        rows = jax.lax.broadcasted_iota(jnp.int32, loss_ref.shape, 0)
        loss_ref[:] = loss_ref[:] + jnp.where(rows == 0, l1_lane[None, :], 0.0)

        def eik_body():
            """u-chain, eikonal loss row, second-order ū/t chain; returns
            the eikonal contribution s̄_e [1, T] to the δ-chain seed."""
            u_last = m * tau
            u_next = u_last.astype(dtype)
            for l in range(nl - 1, 0, -1):
                up = mmT(lin[l]["Mp"], u_next)
                d_mask = (h_scr[l - 1][:].astype(jnp.float32) > 0).astype(jnp.float32)
                u_scr[l - 1][:] = (up * d_mask).astype(dtype)
                u_next = u_scr[l - 1][:]
            g = mmT(lin[0]["Mx"], u_scr[0][:])  # [8, T]
            if latent_li is not None:
                g = g + mmT(lin[latent_li]["Mx"], u_scr[latent_li][:])
            gsq = jnp.sum(g * g, axis=0, keepdims=True)
            gn = jnp.sqrt(jnp.maximum(gsq, 1e-24))
            eik_lane = (1.0 - gn) ** 2  # [1, T]
            if weighted:
                eik_lane = eik_lane * wrow
            loss_ref[:] = loss_ref[:] + jnp.where(rows == 1, eik_lane, 0.0)
            # g already carries the m·τ factor (u_last seed), so the ū-chain
            # below is seeded with ḡ directly; the a_last sensitivity of the
            # seed folds into s̄ as −2y·(ḡᵀg)
            gbar = (eik_coef * (gn - 1.0) / gn) * g
            if weighted:
                # w scales the whole eikonal reverse pass (ū/t chain and
                # the s̄_e seed both derive from ḡ)
                gbar = gbar * wrow
            gdot = jnp.sum(gbar * g, axis=0, keepdims=True)

            # ---- ū/t chain (second-order eikonal) ----
            gbar_c = gbar.astype(dtype)
            lout[0]["dMx"][:] += outer(u_scr[0][:], gbar_c)
            ubar = mm(lin[0]["Mx"][:], gbar_c)  # [w0, T]
            for l in range(1, nl):
                t_prev = ((h_scr[l - 1][:].astype(jnp.float32) > 0).astype(jnp.float32) * ubar).astype(dtype)
                u_l = u_scr[l][:] if l < nl - 1 else (m * tau).astype(dtype)
                lout[l]["dMp"][:] += outer(u_l, t_prev)
                if l == latent_li:
                    lout[l]["dMx"][:] += outer(u_l, gbar_c)
                if l < nl - 1:
                    ubar = mm(lin[l]["Mp"][:], t_prev)
                    if l == latent_li:
                        ubar = ubar + mm(lin[l]["Mx"][:], gbar_c)
            return -2.0 * y[0:1] * gdot

        if not use_eikonal:
            sbar_e = jnp.zeros((1, x.shape[1]), jnp.float32)
        elif eik_gated:
            # EikonalNumPoints: only the first eik_tps tiles of each scene
            # run the (expensive) eikonal chains; the rest skip the whole
            # branch and contribute s̄_e = 0
            sbar_scr[:] = jnp.zeros_like(sbar_scr)

            @pl.when(pid % tps < eik_tps)
            def _eik():
                sbar_scr[:] = row0 * eik_body()

            sbar_e = sbar_scr[:][0:1]
        else:
            sbar_e = eik_body()

        # ---- δ-chain ----
        l1_seed = m[0:1] * tau[0:1] * sgn[0:1] * inv_ntot
        if weighted:
            l1_seed = l1_seed * wrow
        sbar = l1_seed + sbar_e  # [1, T]
        delta = row0 * sbar  # [8, T]
        for l in range(nl - 1, -1, -1):
            d_c = delta.astype(dtype)
            if "dMp" in lout[l]:
                lout[l]["dMp"][:] += outer(d_c, h_scr[l - 1][:])
            if "dMx" in lout[l]:
                lout[l]["dMx"][:] += outer(d_c, x_c)
            lout[l]["dc"][:] += jnp.sum(delta, axis=1, keepdims=True).T[None]
            if l > 0:
                dh = mmT(lin[l]["Mp"], d_c)
                delta = dh * (h_scr[l - 1][:].astype(jnp.float32) > 0).astype(jnp.float32)

    return kernel


def build_fused_train(
    decoder,
    batch_scenes: int,
    points_per_scene: int,
    clamp_dist: float,
    num_total: int,
    use_eikonal: bool,
    eik_weight: float = 0.002,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    tile: int = 256,
    eik_points: int | None = None,
    want_wgrad: bool = True,
    weighted: bool = False,
    eik_scenes: int | None = None,
):
    """Builds fn(parts, consts, xyz_t [8,N], gt_t [8,N]) ->
    (l1_sum, eik_sum, dparts, dconsts). N = batch_scenes*points_per_scene;
    l1 gradients use 1/num_total (the reference's full-batch normalizer),
    eikonal uses 1/fn.n_eik (a mean over its points, like the XLA path).

    ``eik_points``: EikonalNumPoints subsampling — eikonal runs on the
    first ceil(eik_points/tile) tiles of each scene only (rounded UP to a
    tile multiple; ``fn.eik_points_effective`` reports the rounded count).

    ``want_wgrad=False``: frozen-decoder mode — dparts come back as
    {Mp: None, Mx: None} and the kernel skips every weight outer product
    (~2 instead of ~3 matmul sweeps); dconsts (→ dlat) are still exact.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan, latent_li, L, nl = _layer_plan(decoder)
    S, P = batch_scenes, points_per_scene
    # step down through divisible tiles (1024 -> 512 -> 256 -> 128) rather
    # than jumping straight to the 128 lane tile: auto-selected large tiles
    # must not regress small-P configs below the old 256 default
    while tile > TILE and P % tile:
        tile //= 2
    n = S * P
    tps = P // tile
    n_tiles = n // tile
    widths = [out for _, _, out in plan]

    if use_eikonal and eik_points is not None and 0 < eik_points < P:
        eik_tps = min(tps, max(1, -(-int(eik_points) // tile)))
    else:
        eik_tps = tps
    # ``eik_scenes``: scene count for the eikonal-mean normalizer when it
    # differs from S — the REAL (unpadded) scenes of a weighted batch, or
    # the GLOBAL batch when each shard of a mesh normalizes by the global
    # count. Derived here from the kernel's own eik_tps/tile so the
    # normalizer can never diverge from what the kernel actually gates on.
    n_eik = (S if eik_scenes is None else int(eik_scenes)) * eik_tps * tile
    if not use_eikonal:
        n_eik = 1  # never used (eik row stays zero); avoids a 0-divide

    kernel = _make_kernel(
        plan, latent_li, use_eikonal, dtype, tps, eik_tps, want_wgrad, weighted
    )

    def tile_ix(i):
        return (0, i)

    def const_ix(i):
        return (i // tps, 0, 0)

    def fixed_ix(i):
        return (0, 0)

    def out_pad(l):
        return _XPAD if l == nl - 1 else widths[l]

    in_specs = [
        pl.BlockSpec((_XPAD, tile), tile_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((_XPAD, tile), tile_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_specs = [pl.BlockSpec((8, tile), fixed_ix, memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((8, tile), jnp.float32)]
    for l, (kind, prev, out) in enumerate(plan):
        op = out_pad(l)
        if kind != "first":
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # Mp
        if kind in ("first", "latent"):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # Mx
        in_specs.append(pl.BlockSpec((1, 1, op), const_ix, memory_space=pltpu.VMEM))
    for l, (kind, prev, out) in enumerate(plan):
        op = out_pad(l)
        if want_wgrad and kind != "first":
            pw = widths[l - 1]
            out_specs.append(pl.BlockSpec((op, pw), fixed_ix, memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((op, pw), jnp.float32))
        if want_wgrad and kind in ("first", "latent"):
            out_specs.append(pl.BlockSpec((op, _XPAD), fixed_ix, memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((op, _XPAD), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, op), const_ix, memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((S, 1, op), jnp.float32))

    scratch = [pltpu.VMEM((widths[l], tile), dtype) for l in range(nl - 1)]
    if use_eikonal:
        scratch += [pltpu.VMEM((widths[l], tile), dtype) for l in range(nl - 1)]
        if eik_tps < tps:
            scratch.append(pltpu.VMEM((_XPAD, tile), jnp.float32))  # sbar_e carry

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    pallas_fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=compiler_params,
    )

    def fn(parts, consts, xyz_t, gt_t):
        scal = jnp.array(
            [[clamp_dist, 1.0 / num_total, 2.0 * eik_weight / n_eik, 0.0]], jnp.float32
        )
        inputs = [xyz_t, gt_t, scal]
        for l, (kind, prev, out) in enumerate(plan):
            op = out_pad(l)
            if kind != "first":
                mp = parts[l]["Mp"].astype(dtype)
                if op != out:
                    mp = jnp.zeros((op, mp.shape[1]), dtype).at[:out].set(mp)
                inputs.append(mp)
            if kind in ("first", "latent"):
                mx = jnp.zeros((op, _XPAD), dtype).at[:out, :3].set(
                    parts[l]["Mx"].astype(dtype)
                )
                inputs.append(mx)
            c = consts[l]
            if op != out:
                c = jnp.zeros((S, op), jnp.float32).at[:, :out].set(c)
            inputs.append(c.reshape(S, 1, op))
        outs = pallas_fn(*inputs)
        it = iter(outs)
        loss_acc = next(it)
        dparts, dconsts = [], []
        for l, (kind, prev, out) in enumerate(plan):
            e = {"Mp": None, "Mx": None}
            if want_wgrad and kind != "first":
                e["Mp"] = next(it)[:out]
            if want_wgrad and kind in ("first", "latent"):
                e["Mx"] = next(it)[:out, :3]
            dconsts.append(next(it)[:, 0, :out])
            dparts.append(e)
        return jnp.sum(loss_acc[0]), jnp.sum(loss_acc[1]), dparts, dconsts

    fn.n_eik = n_eik
    fn.eik_points_effective = eik_tps * tile
    return fn


def fused_point_grads(
    decoder,
    net_params,
    lat_rows,
    xyz,
    sdf_gt,
    clamp_dist: float,
    use_eikonal: bool,
    num_total: int,
    eik_weight: float = 0.002,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    eik_points: int | None = None,
    want_net_grads: bool = True,
):
    """Fused loss + gradients for one (micro)batch.

    Args: lat_rows [B, L]; xyz [B, P, 3]; sdf_gt [B, P, 1] (unclipped);
    num_total = the XLA path's clamped-L1 normalizer (full-batch points);
    eik_points = EikonalNumPoints subsample per scene (None = all P);
    want_net_grads=False returns grads_net as exact zeros and skips the
    weight-gradient sweeps in the kernel (frozen-decoder mode).
    Returns (grads_net pytree like net_params, dlat [B, L],
    aux {sdf, eikonal}).
    """
    B, P = xyz.shape[0], xyz.shape[1]
    n = B * P
    xyz_t = jnp.zeros((_XPAD, n), jnp.float32).at[:3].set(xyz.reshape(n, 3).T)
    gt = jnp.clip(sdf_gt.reshape(n), -clamp_dist, clamp_dist)
    gt_t = jnp.zeros((_XPAD, n), jnp.float32).at[0].set(gt)
    return _fused_point_grads_core(
        decoder, net_params, lat_rows, xyz_t, gt_t, B, P,
        clamp_dist, use_eikonal, num_total, eik_weight, dtype, interpret,
        eik_points, want_net_grads,
    )


def fused_point_grads_t(
    decoder,
    net_params,
    lat_rows,
    xyzgt_t,
    clamp_dist: float,
    use_eikonal: bool,
    num_total: int,
    eik_weight: float = 0.002,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    eik_points: int | None = None,
    weights=None,
    n_real: int | None = None,
    eik_scenes: int | None = None,
    want_net_grads: bool = True,
):
    """Like ``fused_point_grads`` but taking the batch in the SoA layout
    ``xyzgt_t`` [4, B, P] produced by ``sample_sdf_batch(layout="t")`` —
    the kernel's [components, n] input builds with sublane row copies only
    (no lane-shuffling transpose; ~2.5 ms/step at the flagship workload).

    ``weights`` [B] (optional): per-scene 0/1 weights for pad-and-mask mesh
    batches. Loss sums and gradients scale by w exactly; ``num_total``
    must already count REAL points only, and the eikonal mean runs over
    sum(w) * eik-points."""
    B, P = xyzgt_t.shape[1], xyzgt_t.shape[2]
    n = B * P
    flat = xyzgt_t.reshape(4, n)
    xyz_t = jnp.zeros((_XPAD, n), jnp.float32).at[:3].set(flat[:3])
    gt_t = jnp.zeros((_XPAD, n), jnp.float32).at[0].set(
        jnp.clip(flat[3], -clamp_dist, clamp_dist)
    )
    if weights is not None:
        gt_t = gt_t.at[1].set(jnp.repeat(weights.astype(jnp.float32), P))
        if n_real is None:
            raise ValueError("weights requires n_real (static real-scene count)")
        if eik_scenes is None:
            eik_scenes = int(n_real)
    return _fused_point_grads_core(
        decoder, net_params, lat_rows, xyz_t, gt_t, B, P,
        clamp_dist, use_eikonal, num_total, eik_weight, dtype, interpret,
        eik_points, want_net_grads, weighted=weights is not None,
        eik_scenes=eik_scenes,
    )


def make_fused_sdf_l1(decoder, clamp_dist: float, dtype=jnp.bfloat16,
                      interpret: bool = False, train_net: bool = True,
                      mesh=None, axis: str | None = None):
    """Fused Stage-2 SDF-consistency term (ref: train_MLP_VAE_deep_sdf.py
    :3097-3138 semantics, the clamped-L1 half of ``deep_sdf_loss``).

    Returns ``f(net_params, lat_rows [B, L], xyz [B, P, 3], gt [B, P, 1])
    -> sum |clip(pred) - clip(gt)| / (B*P)``, differentiable w.r.t. BOTH
    ``lat_rows`` (gradients flow into the VAE through z_hat) and
    ``net_params`` (the TrainSDFDecoder=true case) via one custom_vjp
    backed by the fused forward+backward kernel — the same machinery as
    Stage-1 minus the eikonal chain (~2 matmul sweeps instead of ~4.5).
    The code-norm regularizer is NOT included (a scene-level scalar the
    caller computes in plain XLA).

    ``train_net=False`` (TrainSDFDecoder=false, the flagship Stage-2
    config): the kernel skips every weight outer product — ~2/3 of its
    backward FLOPs — and net_params cotangents come back as exact zeros
    (the decoder is frozen, so they are never consumed).

    ``mesh`` (optional): shard_map the kernel over the scene axis of the
    device mesh (``fused_point_grads_sharded``); the scene batch must
    divide the mesh size."""

    @jax.custom_vjp
    def f(net_params, lat_rows, xyz, gt):
        _, _, aux = _grads(net_params, lat_rows, xyz, gt)
        return aux["sdf"]

    def _grads(net_params, lat_rows, xyz, gt):
        num_total = xyz.shape[0] * xyz.shape[1]
        if mesh is not None:
            xyzgt_t = jnp.concatenate([xyz, gt], axis=2).transpose(2, 0, 1)
            return fused_point_grads_sharded(
                decoder, net_params, lat_rows, xyzgt_t, clamp_dist,
                use_eikonal=False, num_total=num_total, mesh=mesh,
                axis=axis or mesh.axis_names[0], dtype=dtype,
                interpret=interpret, want_net_grads=train_net,
            )
        return fused_point_grads(
            decoder, net_params, lat_rows, xyz, gt, clamp_dist,
            use_eikonal=False, num_total=num_total, dtype=dtype,
            interpret=interpret, want_net_grads=train_net,
        )

    def fwd(net_params, lat_rows, xyz, gt):
        grads_net, dlat, aux = _grads(net_params, lat_rows, xyz, gt)
        return aux["sdf"], (grads_net, dlat, jnp.zeros_like(xyz), jnp.zeros_like(gt))

    def bwd(res, ct):
        grads_net, dlat, xyz_z, gt_z = res
        return (
            jax.tree.map(lambda g: (g * ct).astype(g.dtype), grads_net),
            dlat * ct,
            xyz_z,  # zeros: xyz/gt cotangents are never consumed (XLA DCEs)
            gt_z,
        )

    f.defvjp(fwd, bwd)
    return f


def _fused_point_grads_core(
    decoder, net_params, lat_rows, xyz_t, gt_t, B, P,
    clamp_dist, use_eikonal, num_total, eik_weight, dtype, interpret,
    eik_points=None, want_net_grads=True, weighted=False, eik_scenes=None,
):
    plan, latent_li, L, nl = _layer_plan(decoder)

    def eff(params):
        ws, bs = [], []
        for l in range(nl):
            p = params[f"lin{l}"]
            ws.append(weight_norm_effective(p) if "v" in p else p["w"])
            bs.append(p["b"])
        return ws, bs

    if want_net_grads:
        (weights, biases), vjp_eff = jax.vjp(eff, net_params)
    else:
        weights, biases = eff(net_params)
    parts = split_weights(decoder, weights)

    consts = []
    for l in range(nl):
        c = jnp.broadcast_to(biases[l][None, :], (B, biases[l].shape[0]))
        if parts[l]["Wz"] is not None:
            c = c + lat_rows @ parts[l]["Wz"]
        consts.append(c)

    # Points-per-tile by FLOP mix (same-window interleaved kernel scans,
    # round 4). No-eikonal (stage-2 SDF-consistency): frozen 25.9 -> 21.7 ms
    # at 1024, full-wgrad 34.7 -> 31.4 ms at 512 (1024 regresses there: the
    # wgrad outer products' scratch occupancy). Eikonal: full 65.8 -> 64.6 ms
    # at 1024; tile-gated (EikonalNumPoints) 43.4 -> 41.7 ms at 512 — taken
    # only when the 512-rounding of E matches the documented 256-rounding,
    # so the effective eikonal point count (and n_eik normalizer) never
    # changes with the tile choice. build_fused_train steps the tile down
    # through divisible sizes when P isn't tile-divisible.
    if not use_eikonal:
        tile = 512 if want_net_grads else 1024
    elif eik_points is not None and 0 < eik_points < P:
        e256 = -(-int(eik_points) // 256) * 256
        tile = 512 if e256 % 512 == 0 else 256
    else:
        tile = 1024
    fused = build_fused_train(
        decoder, B, P, clamp_dist, num_total, use_eikonal, eik_weight, dtype, interpret,
        tile=tile, eik_points=eik_points, want_wgrad=want_net_grads,
        weighted=weighted, eik_scenes=eik_scenes,
    )
    l1_sum, eik_sum, dparts, dconsts = fused(parts, consts, xyz_t, gt_t)
    sdf_l = l1_sum / num_total
    eik_l = eik_weight * eik_sum / fused.n_eik if use_eikonal else jnp.float32(0.0)

    if not want_net_grads:
        # frozen decoder: only the latent cotangents are consumed
        dlat = jnp.zeros_like(lat_rows)
        for l in range(nl):
            if parts[l]["Wz"] is not None:
                dlat = dlat + dconsts[l] @ parts[l]["Wz"].T
        grads_net = jax.tree.map(jnp.zeros_like, net_params)
        return grads_net, dlat, {"sdf": sdf_l, "eikonal": eik_l}

    dweights, dbiases = [], []
    dlat = jnp.zeros_like(lat_rows)
    for l in range(nl):
        in_dim, out_dim, _, _ = decoder.layer_shapes[l]
        kind = plan[l][0]
        dc = dconsts[l]  # [B, out]
        dW = jnp.zeros((in_dim, out_dim), jnp.float32)
        if kind == "first":
            dW = dW.at[:L].set(lat_rows.T @ dc)
            dW = dW.at[L : L + 3].set(dparts[l]["Mx"].T)
            dlat = dlat + dc @ parts[l]["Wz"].T
        elif kind == "latent":
            prev = in_dim - (L + 3)
            dW = dW.at[:prev].set(dparts[l]["Mp"].T)
            dW = dW.at[prev : prev + L].set(lat_rows.T @ dc)
            dW = dW.at[prev + L :].set(dparts[l]["Mx"].T)
            dlat = dlat + dc @ parts[l]["Wz"].T
        else:
            dW = dparts[l]["Mp"].T
        dweights.append(dW)
        dbiases.append(jnp.sum(dc, axis=0))

    (grads_net,) = vjp_eff((dweights, dbiases))
    return grads_net, dlat, {"sdf": sdf_l, "eikonal": eik_l}


def fused_point_grads_sharded(
    decoder,
    net_params,
    lat_rows,
    xyzgt_t,
    clamp_dist: float,
    use_eikonal: bool,
    num_total: int,
    mesh,
    axis: str = "data",
    eik_weight: float = 0.002,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    eik_points: int | None = None,
    weights=None,
    n_real: int | None = None,
    want_net_grads: bool = True,
):
    """shard_map of the fused kernel over the scene axis of a device mesh.

    The TPU-native analog of the reference's ``torch.nn.DataParallel``
    wrap of the decoder (ref: train_deep_sdf.py:352) — scatter the batch,
    run replicas, all-reduce parameter grads — except the per-chip program
    here is the fused Pallas kernel and the all-reduce is an XLA psum over
    ICI rather than NCCL.

    The multi-chip form of ``fused_point_grads_t``: ``lat_rows`` [B, L] and
    ``xyzgt_t`` [4, B, P] shard on the scene axis (B divisible by the mesh
    size), decoder params replicate. Each chip runs the single-chip Pallas
    kernel on its local scenes; decoder gradients and the loss sums are
    psum'ed over ICI while latent gradients stay scene-sharded (they are
    per-scene rows — no collective needed). ``num_total`` / ``weights`` /
    ``n_real`` follow ``fused_point_grads_t`` semantics with GLOBAL counts:
    each shard normalizes locally by the global count, so the psum of the
    shard losses equals the single-chip value exactly.

    Returns (grads_net replicated, dlat [B, L] scene-sharded, aux).
    """
    from jax.sharding import PartitionSpec

    # check_vma=False: pallas_call's out_shapes carry no varying-mesh-axes
    # annotation; the psum placement here is hand-verified instead
    shard_map = functools.partial(jax.shard_map, check_vma=False)

    # every shard normalizes by the GLOBAL counts (num_total and this),
    # so the psum of the shard losses equals the single-chip values
    eik_scenes_global = int(n_real) if weights is not None else lat_rows.shape[0]

    def local(net_params_l, lat_l, xyzgt_l, w_l):
        g_net, dlat, aux = fused_point_grads_t(
            decoder, net_params_l, lat_l, xyzgt_l, clamp_dist, use_eikonal,
            num_total, eik_weight=eik_weight, dtype=dtype, interpret=interpret,
            eik_points=eik_points, weights=w_l, n_real=n_real,
            eik_scenes=eik_scenes_global, want_net_grads=want_net_grads,
        )
        if want_net_grads:
            g_net = jax.lax.psum(g_net, axis)
        aux = {k: jax.lax.psum(v, axis) for k, v in aux.items()}
        return g_net, dlat, aux

    if weights is None:
        fn = shard_map(
            lambda p, z, x: local(p, z, x, None),
            mesh=mesh,
            in_specs=(PartitionSpec(), PartitionSpec(axis), PartitionSpec(None, axis, None)),
            out_specs=(PartitionSpec(), PartitionSpec(axis), PartitionSpec()),
        )
        return fn(net_params, lat_rows, xyzgt_t)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            PartitionSpec(), PartitionSpec(axis),
            PartitionSpec(None, axis, None), PartitionSpec(axis),
        ),
        out_specs=(PartitionSpec(), PartitionSpec(axis), PartitionSpec()),
    )
    return fn(net_params, lat_rows, xyzgt_t, weights)

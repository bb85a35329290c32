"""Stage-1 DeepSDF auto-decoder trainer, TPU-native.

Behavioral equivalent of the reference trainer (ref: train_deep_sdf.py:211-1080),
re-architected for XLA: the entire training step — balanced pos/neg point
subsample (a device-side random gather), decoder forward, clamped-L1 +
code-reg (+ eikonal / covariance / GMM-prior / isometry / grad-metric-iso),
backward, gradient clipping, and the two-group Adam update of
{decoder params, latent table (+ GMM params)} — is ONE jitted program.
There are no DataLoader workers and no per-batch host->device copies: all
SDF samples live in device HBM and per-epoch LR scalars are step arguments.

Differences from the reference (documented deviations):
* per-scene subsampling is uniform-with-replacement (the reference's RAM
  path uses contiguous windows of a pre-shuffled buffer — a bias we drop;
  its non-RAM path is uniform like ours, deep_sdf/data.py:91-136).
* isometry losses run without dropout (deterministic decoder) and the
  per-scene Python loop becomes a vmap.
* CodeBound projection renormalizes the batch's rows before the forward
  (exactly nn.Embedding(max_norm=...) lookup-time renorm semantics).
"""

from __future__ import annotations

import logging
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import msd_tpu.workspace as ws
from msd_tpu.config import get_spec_with_default, note_noop_keys
from msd_tpu.data.sdf_samples import SdfDataset, sample_sdf_batch
from msd_tpu.data.splits import load_split
from msd_tpu.losses.sdf import code_regularization, eikonal_loss
from msd_tpu.losses.stage1 import (
    covariance_loss,
    gmm_prior_init,
    gmm_prior_loss,
    grad_metric_isotropy_loss,
    isometry_loss,
    select_near_surface_points,
)
from msd_tpu.lr_schedules import (
    StepLearningRateOnPlateauSchedule,
    get_learning_rate_schedules,
)
from msd_tpu.models import build_decoder
from msd_tpu.utils import checkpoint as ckpt
from msd_tpu.utils.optim import (
    adam_init,
    adam_update,
    clip_grads_by_global_norm,
    fused_clip_adam,
    project_code_bound,
)

# MatmulPrecision spec values -> jax.default_matmul_precision context names.
# "highest"/"float32" = exact f32 matmuls (default, safest for Chamfer
# parity); "bfloat16"/"default" = bf16 MXU inputs with f32 accumulation
# (~3x faster training on v5e; validate Chamfer before adopting).
_PRECISIONS = {
    "default": "bfloat16",
    "bfloat16": "bfloat16",
    "float32": "float32",
    "highest": "float32",
    "tensorfloat32": "tensorfloat32",
}


class Stage1Trainer:
    def __init__(
        self,
        experiment_directory: str,
        specs: dict | None = None,
        dataset: SdfDataset | None = None,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a "data" axis. When
        given, the scene/point batch is sharded over it (dp/sp), the latent
        table is sharded over its scene axis, decoder params are replicated,
        and XLA inserts the gradient psum over ICI (SURVEY §2.6/§5.8)."""
        self.mesh = mesh
        self.experiment_directory = experiment_directory
        self.specs = specs if specs is not None else ws.load_experiment_specifications(experiment_directory)
        note_noop_keys(self.specs)
        specs = self.specs
        logging.info("Experiment description: \n%s", specs.get("Description", "(none)"))  # ref: train_deep_sdf.py:219

        self.data_source = specs["DataSource"]
        self.latent_size = specs["CodeLength"]
        self.num_epochs = specs["NumEpochs"]
        self.num_samp_per_scene = specs["SamplesPerScene"]
        self.scene_per_batch = specs["ScenesPerBatch"]
        self.clamp_dist = specs["ClampingDistance"]
        self.snapshot_frequency = specs["SnapshotFrequency"]
        self.additional_snapshots = get_spec_with_default(specs, "AdditionalSnapshots", [])
        self.checkpoints = sorted(
            list(range(self.snapshot_frequency, self.num_epochs + 1, self.snapshot_frequency))
            + list(self.additional_snapshots)
        )
        self.log_frequency = get_spec_with_default(specs, "LogFrequency", 200)
        self.grad_clip = get_spec_with_default(specs, "GradientClipNorm", None)
        self.code_bound = get_spec_with_default(specs, "CodeBound", None)

        self.do_code_regularization = get_spec_with_default(specs, "CodeRegularization", True)
        self.code_reg_lambda = get_spec_with_default(specs, "CodeRegularizationLambda", 1e-4)
        self.use_eikonal = get_spec_with_default(specs, "UseEikonal", False)
        # EikonalNumPoints (TPU extension, default None = all points): the
        # eikonal term is evaluated on a per-scene random subsample of this
        # many points. The eikonal chains cost ~half the step's FLOPs
        # (PERF.md §2 budget); points arrive in freshly-sampled random order
        # each step, so a prefix subsample is unbiased. The fused kernel
        # rounds it UP to its 256-lane tile.
        _eik_pts = get_spec_with_default(specs, "EikonalNumPoints", None)
        self.eikonal_num_points = int(_eik_pts) if _eik_pts else None
        self.use_covariance = get_spec_with_default(specs, "UseCovarianceLoss", False)
        self.lambda_cov = get_spec_with_default(specs, "CovarianceLossLambda", 1e-3)

        self.use_gmm_prior = get_spec_with_default(specs, "UseGMMPriorLoss", False)
        self.gmm_lambda = get_spec_with_default(specs, "GMMLambda", 1e-4)
        self.gmm_k = get_spec_with_default(specs, "GMMK", 2)
        self.gmm_init_sigma = get_spec_with_default(specs, "GMMInitSigma", 0.5)
        self.gmm_min_sigma = get_spec_with_default(specs, "GMMMinSigma", 0.05)
        self.gmm_learn_pi = get_spec_with_default(specs, "GMMLearnPi", False)

        self.use_isometry = get_spec_with_default(specs, "UseIsometryLoss", False)
        self.lambda_iso = get_spec_with_default(specs, "IsometryLossLambda", 1e-3)
        self.iso_num_points = get_spec_with_default(specs, "IsometryNumPoints", 256)
        self.iso_num_probes = get_spec_with_default(specs, "IsometryNumProbes", 1)
        self.iso_compute_frequency = get_spec_with_default(specs, "IsometryComputeFrequency", 1)
        _iso_cap = get_spec_with_default(specs, "IsometryScenesPerBatch", None)
        self.iso_scenes_per_batch = int(_iso_cap) if _iso_cap else None
        self.use_isometry_mixup = get_spec_with_default(specs, "UseIsometryMixup", False)
        self.iso_mixup_alpha = get_spec_with_default(specs, "IsometryMixupAlpha", 0.2)
        self.iso_mixup_prob = get_spec_with_default(specs, "IsometryMixupProb", 0.0)

        self.use_grad_metric_iso = get_spec_with_default(specs, "UseGradMetricIsotropyLoss", False)
        self.grad_metric_iso_lambda = get_spec_with_default(specs, "GradMetricIsoLossLambda", 1.0)
        self.grad_metric_iso_alpha = get_spec_with_default(specs, "GradMetricIsoAlpha", 1.0)
        self.grad_metric_iso_normalize = get_spec_with_default(specs, "GradMetricIsoNormalize", True)

        # measured on v5e (32x16384 pts/step, 8x512 net, eikonal on):
        # bfloat16 = 144 ms/step vs float32 = 597 ms/step with identical
        # training loss to 4 decimals after 11 epochs -> bf16 default.
        precision_name = str(get_spec_with_default(specs, "MatmulPrecision", "default")).lower()
        self.precision = _PRECISIONS.get(precision_name, "bfloat16")

        self.lr_schedules = get_learning_rate_schedules(specs)

        # --- decoder ---
        self.decoder = build_decoder(specs["NetworkArch"], self.latent_size, specs["NetworkSpecs"])
        self.train_dropout = bool(self.decoder.dropout) and self.decoder.dropout_prob > 0

        # --- data ---
        if dataset is None:
            train_split = load_split(specs["TrainSplit"])
            dataset = SdfDataset.from_split(self.data_source, train_split, self.num_samp_per_scene)
        self.dataset = dataset
        self.num_scenes = dataset.num_scenes
        logging.info("There are %d scenes", self.num_scenes)

        # --- state ---
        seed = get_spec_with_default(specs, "Seed", 0)
        self.base_key = jax.random.PRNGKey(seed)
        k_dec, k_lat, k_gmm = jax.random.split(self.base_key, 3)
        code_init_std = get_spec_with_default(specs, "CodeInitStdDev", 1.0)
        latents = (
            jax.random.normal(k_lat, (self.num_scenes, self.latent_size))
            * (code_init_std / math.sqrt(self.latent_size))
        )
        # Pad the latent table's scene axis to a mesh multiple so it always
        # shards (pad rows are zero-init, never indexed — scene ids stay
        # < num_scenes — and keep zero Adam moments). The real rows are drawn
        # BEFORE padding so 1-vs-N device trajectories are bit-comparable.
        self.num_scenes_padded = self.num_scenes
        if self.mesh is not None:
            from msd_tpu.parallel import mesh_size, pad_to_multiple

            self.num_scenes_padded = pad_to_multiple(self.num_scenes, mesh_size(self.mesh))
            if self.num_scenes_padded != self.num_scenes:
                latents = jnp.concatenate(
                    [latents, jnp.zeros(
                        (self.num_scenes_padded - self.num_scenes, self.latent_size),
                        latents.dtype)]
                )
        net_params = self.decoder.init(k_dec)

        # pretrained-decoder warm start (ref: train_deep_sdf.py:115-132,
        # :355-374). When training later resumes from a checkpoint, resume()
        # overwrites these weights — the same net effect as the reference's
        # skip-on-continue.
        if get_spec_with_default(specs, "UsePretrainedSDFDecoder", False):
            pretrained_dir = get_spec_with_default(specs, "PretrainedSDFDecoderDir", None)
            if pretrained_dir is None:
                raise RuntimeError(
                    "UsePretrainedSDFDecoder=true but PretrainedSDFDecoderDir is not set."
                )
            pretrained_ckpt = get_spec_with_default(specs, "PretrainedSDFDecoderCheckpoint", "latest")
            filename = os.path.join(pretrained_dir, ws.model_params_subdir, pretrained_ckpt + ".pth")
            if not os.path.isfile(filename):
                raise RuntimeError(f'pretrained model state dict "{filename}" does not exist')
            import torch

            data = torch.load(filename, map_location="cpu", weights_only=False)
            net_params = self.decoder.params_from_torch_state_dict(data["model_state_dict"])
            logging.info(
                "Loaded pretrained SDF decoder from %s (checkpoint %s, epoch %s).",
                pretrained_dir, pretrained_ckpt, data.get("epoch"),
            )

        state = {"net": net_params, "lat": latents}
        if self.use_gmm_prior:
            state["gmm"] = gmm_prior_init(k_gmm, self.gmm_k, self.latent_size, self.gmm_init_sigma)
        self.state = state
        self.opt_state = adam_init(state)
        if self.mesh is not None:
            self._apply_mesh_placement()

        # fused forward+backward Pallas training kernel (ops/fused_train.py):
        # one VMEM-resident pass computes loss + all gradients, replacing
        # XLA autodiff's ~5 HBM-bound matmul sweeps. Enabled on TPU for
        # supported configs; "UseFusedTrainKernel": false opts out.
        self.use_fused_train = bool(get_spec_with_default(specs, "UseFusedTrainKernel", True))

        # host-side logs (reference Logs.pth families)
        self.loss_log = []
        self.loss_log_epoch = []
        self.lr_log = []
        self.lat_mag_log = []
        self.timing_log = []
        self.param_mag_log = {}
        self.epoch = 0
        self.global_batch_idx = 0

        self._writer = None
        self._epoch_fns = {}  # keyed on (batch_split, nb)
        self._epoch_block_fns = {}  # keyed on (batch_split, nb, n_epochs)

    # ------------------------------------------------------------------
    def _apply_mesh_placement(self):
        """Shard the latent table (+ its Adam moments) over the mesh's scene
        axis; replicate decoder params. Batches are sharded per step in
        train_epoch."""
        from msd_tpu.parallel import (
            batch_sharding, mesh_size, pad_to_multiple, replicated_sharding,
        )

        replicated = replicated_sharding(self.mesh)
        # the scene axis was padded to a mesh multiple at init, so the
        # latent table always shards
        scene_shard = batch_sharding(self.mesh)

        def place(tree):
            out = dict(tree)
            out["net"] = jax.device_put(tree["net"], replicated)
            out["lat"] = jax.device_put(tree["lat"], scene_shard)
            if "gmm" in tree:
                out["gmm"] = jax.device_put(tree["gmm"], replicated)
            return out

        self.state = place(self.state)
        self.opt_state = type(self.opt_state)(
            count=jax.device_put(self.opt_state.count, replicated),
            mu=place(self.opt_state.mu),
            nu=place(self.opt_state.nu),
        )
        # The scene batch pads to a mesh multiple (mask weights zero the pad
        # scenes' loss/grad contributions inside the step), so it always
        # shards — no replication cliff for prime-ish batch sizes.
        self._batch_pad = pad_to_multiple(self.scene_per_batch, mesh_size(self.mesh))
        if self._batch_pad != self.scene_per_batch:
            import logging as _logging

            _logging.info(
                "scene batch (%d) padded to %d for %d devices (masked)",
                self.scene_per_batch, self._batch_pad, mesh_size(self.mesh),
            )
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated

    # ------------------------------------------------------------------
    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(
                log_dir=os.path.join(self.experiment_directory, ws.tb_logs_dir)
            )
        return self._writer

    # ------------------------------------------------------------------
    def _build_step(self, batch_split: int = 1):
        decoder = self.decoder
        P = self.num_samp_per_scene
        clamp_dist = self.clamp_dist
        use_eik = self.use_eikonal
        use_cov = self.use_covariance
        use_gmm = self.use_gmm_prior
        use_iso = self.use_isometry
        use_gmi = self.use_grad_metric_iso
        train_dropout = self.train_dropout
        latent_dropout = decoder.latent_dropout

        # fused Pallas fwd+bwd path (TPU, bf16, supported configs): one
        # VMEM-resident kernel produces loss + every gradient per microbatch.
        # Multi-chip: the kernel shard_maps over the scene axis (decoder
        # grads psum over ICI, latent rows stay sharded); padded batches
        # mask pad scenes via the kernel's per-scene weight row.
        # MSD_FUSED_FORCE=interpret: tests exercise the fused path on CPU
        # meshes through the Pallas interpreter (f32, exact-parity checks)
        fused_force = os.environ.get("MSD_FUSED_FORCE") == "interpret"
        use_fused = (
            self.use_fused_train
            and (fused_force
                 or (jax.default_backend() == "tpu" and self.precision == "bfloat16"))
            and not train_dropout
            and not latent_dropout
            and not use_iso
            and not use_gmi
        )
        if use_fused and self.mesh is not None:
            from msd_tpu.parallel import mesh_size

            n_dev = mesh_size(self.mesh)
            b = self.scene_per_batch
            if self._batch_pad != b:
                # padded batch: weighted kernel, single chunk only (the XLA
                # path raises on batch_split > 1 with padding too)
                use_fused = batch_split == 1 and self._batch_pad % n_dev == 0
            else:
                use_fused = b % batch_split == 0 and (b // batch_split) % n_dev == 0
        if use_fused:
            from msd_tpu.ops.fused_train import supports_fused_train

            use_fused = supports_fused_train(decoder, P)
        self._fused_active = use_fused
        do_reg = self.do_code_regularization
        reg_lambda = self.code_reg_lambda
        clamp = self.clamp_dist

        def fused_grad_fn(trainable, idx_chunk, xyzgt_t, key, epoch_f, num_total,
                          weights=None, n_real=None):
            from msd_tpu.ops.fused_train import (
                fused_point_grads_sharded, fused_point_grads_t,
            )

            lat_rows = trainable["lat"][idx_chunk]
            kern_kw = dict(
                eik_points=self.eikonal_num_points,
            )
            if fused_force:
                kern_kw.update(dtype=jnp.float32, interpret=True)
            if self.mesh is not None:
                # scene-sharded shard_map: each chip runs the kernel on its
                # local scenes, decoder grads psum over ICI; the lat-table
                # gather above and the scatter below stay in XLA (the batch
                # scenes land on arbitrary table shards)
                g_net, dlat_rows, aux = fused_point_grads_sharded(
                    decoder, trainable["net"], lat_rows, xyzgt_t,
                    clamp, use_eik, num_total, self.mesh,
                    axis=self.mesh.axis_names[0],
                    weights=weights, n_real=n_real,
                    **kern_kw,
                )
            else:
                g_net, dlat_rows, aux = fused_point_grads_t(
                    decoder, trainable["net"], lat_rows, xyzgt_t,
                    clamp, use_eik, num_total,
                    **kern_kw,
                )
            if do_reg:
                # code reg on the expanded per-point rows = P * per-scene
                # norms (ref: train_deep_sdf.py:609-616); safe-norm grad.
                # Pad scenes (weights=0) contribute nothing.
                s = jnp.sum(lat_rows * lat_rows, axis=1)
                norms = jnp.sqrt(jnp.maximum(s, 1e-24))
                coef = reg_lambda * jnp.minimum(1.0, epoch_f / 100.0) * P / num_total
                aux["reg"] = coef * jnp.sum(norms if weights is None else norms * weights)
                dreg = jnp.where(
                    (s > 1e-24)[:, None], coef * lat_rows / norms[:, None], 0.0
                )
                if weights is not None:
                    dreg = dreg * weights[:, None]
                dlat_rows = dlat_rows + dreg
            else:
                aux["reg"] = jnp.float32(0.0)
            grads = {
                "net": g_net,
                "lat": jnp.zeros_like(trainable["lat"]).at[idx_chunk].add(dlat_rows),
            }
            if "gmm" in trainable:
                grads["gmm"] = jax.tree.map(jnp.zeros_like, trainable["gmm"])
            return grads, aux

        def point_losses(trainable, scene_idx, xyz, sdf_gt, key, epoch_f, num_total,
                         n_real=None):
            """Losses over one (micro)batch of scenes; xyz/sdf_gt [b, P, *].

            ``n_real``: when the batch was padded to a mesh multiple, the
            number of leading REAL scenes — trailing pad scenes are masked
            out of every loss term so the result equals the unpadded run."""
            b = scene_idx.shape[0]
            if n_real is None:
                n_real = b
            w_pts = None
            if n_real != b:
                # [b*P, 1] point weights: 1 for real scenes' points, 0 for pad
                w_pts = jnp.repeat(
                    (jnp.arange(b) < n_real).astype(jnp.float32), P
                )[:, None]
            lat_rows = trainable["lat"][scene_idx]  # [b, L]
            expanded = jnp.repeat(lat_rows, P, axis=0)  # [b*P, L]
            xyz_flat = xyz.reshape(-1, 3)
            gt = jnp.clip(sdf_gt.reshape(-1, 1), -clamp_dist, clamp_dist)

            dropout_key, iso_key, probe_key = jax.random.split(key, 3)
            apply_kwargs = {}
            if train_dropout or latent_dropout:
                apply_kwargs = dict(train=True, rng=dropout_key)

            def pred_from_xyz(x):
                inputs = jnp.concatenate([expanded, x], axis=1)
                pred = decoder.apply(trainable["net"], inputs, **apply_kwargs)
                return jnp.clip(pred, -clamp_dist, clamp_dist)

            aux = {}
            eik_pts = self.eikonal_num_points
            if use_eik and eik_pts is not None and 0 < eik_pts < P:
                # EikonalNumPoints: eikonal on the first E (randomly-ordered)
                # points of each scene via a small vjp; the remaining P-E
                # points run the plain forward only (no double evaluation of
                # the prefix) and the clamped L1 sees every point
                E = int(eik_pts)
                expanded_e = jnp.repeat(lat_rows, E, axis=0)
                xyz_e = xyz[:, :E].reshape(-1, 3)

                def pred_from_xyz_e(x):
                    inputs = jnp.concatenate([expanded_e, x], axis=1)
                    p = decoder.apply(trainable["net"], inputs, **apply_kwargs)
                    return jnp.clip(p, -clamp_dist, clamp_dist)

                pred_e, vjp_e = jax.vjp(pred_from_xyz_e, xyz_e)
                (grads_e,) = vjp_e(jnp.ones_like(pred_e))
                expanded_r = jnp.repeat(lat_rows, P - E, axis=0)
                xyz_r = xyz[:, E:].reshape(-1, 3)
                pred_r = jnp.clip(
                    decoder.apply(
                        trainable["net"],
                        jnp.concatenate([expanded_r, xyz_r], axis=1),
                        **apply_kwargs,
                    ),
                    -clamp_dist, clamp_dist,
                )
                pred = jnp.concatenate(
                    [pred_e.reshape(b, E, 1), pred_r.reshape(b, P - E, 1)], axis=1
                ).reshape(-1, 1)
                w_eik = None
                if n_real != b:
                    w_eik = jnp.repeat(
                        (jnp.arange(b) < n_real).astype(jnp.float32), E
                    )[:, None]
                eik = eikonal_loss(grads_e, weights=w_eik)
            elif use_eik:
                pred, vjp_fn = jax.vjp(pred_from_xyz, xyz_flat)
                (grads_xyz,) = vjp_fn(jnp.ones_like(pred))
                eik = eikonal_loss(grads_xyz, weights=w_pts)
            else:
                pred = pred_from_xyz(xyz_flat)
                eik = 0.0

            abs_err = jnp.abs(pred - gt)
            if w_pts is not None:
                abs_err = abs_err * w_pts
            sdf_l = jnp.sum(abs_err) / num_total
            total = sdf_l + eik
            aux["sdf"] = sdf_l
            aux["eikonal"] = eik

            if self.do_code_regularization:
                reg = code_regularization(
                    expanded if w_pts is None else expanded * w_pts,
                    num_total, self.code_reg_lambda, epoch_f,
                )
                total = total + reg
                aux["reg"] = reg
            else:
                aux["reg"] = 0.0

            # Isometry family on near-surface points, vmapped over scenes
            # (ref: train_deep_sdf.py:619-721).
            if use_iso or use_gmi:
                dec_fn = lambda inp: decoder.apply(trainable["net"], inp)

                def per_scene(i, k):
                    pts = select_near_surface_points(
                        k, xyz[i], sdf_gt[i], clamp_dist, self.iso_num_points
                    )
                    lat = lat_rows[i]
                    if self.use_isometry_mixup:
                        km1, km2, km3 = jax.random.split(k, 3)
                        do_mix = jax.random.bernoulli(km1, self.iso_mixup_prob)
                        partner = jax.random.randint(km2, (), 0, n_real - 1)
                        partner = jnp.where(partner >= i, partner + 1, partner)
                        alpha = jax.random.beta(km3, self.iso_mixup_alpha, self.iso_mixup_alpha)
                        mixed = alpha * lat + (1 - alpha) * lat_rows[partner]
                        lat = jnp.where(do_mix, mixed, lat)
                    lat_exp = jnp.broadcast_to(lat, (self.iso_num_points, lat.shape[0]))
                    out = {}
                    if use_iso:
                        l, a = isometry_loss(
                            dec_fn, lat_exp, pts, self.latent_size,
                            jax.random.fold_in(probe_key, i), self.iso_num_probes,
                        )
                        out["iso"] = l
                        out.update(a)
                    if use_gmi:
                        l, a = grad_metric_isotropy_loss(
                            dec_fn, lat_exp, pts, self.latent_size,
                            self.grad_metric_iso_alpha, self.grad_metric_iso_normalize,
                        )
                        out["gmi"] = l
                        out.update(a)
                    return out

                # IsometryScenesPerBatch: random static-size scene subsample
                # (ref: train_deep_sdf.py:629-638 randperm over unique indices)
                iso_cap = self.iso_scenes_per_batch
                if iso_cap is not None and 0 < iso_cap < n_real:
                    # fold_in(n_real): scene folds use 0..n_real-1, so
                    # n_real is unused (pad scenes never enter iso_rows)
                    iso_rows = jax.random.permutation(
                        jax.random.fold_in(iso_key, n_real), n_real
                    )[:iso_cap]
                else:
                    iso_rows = jnp.arange(n_real)
                scene_keys = jax.vmap(lambda i: jax.random.fold_in(iso_key, i))(iso_rows)
                per = jax.vmap(per_scene)(iso_rows, scene_keys)
                if use_iso:
                    iso_mean = jnp.mean(per["iso"]) * self.lambda_iso
                    total = total + iso_mean
                    aux["iso"] = iso_mean
                    aux["iso_g1"] = jnp.mean(per["iso_g1"])
                    aux["iso_g2"] = jnp.mean(per["iso_g2"])
                if use_gmi:
                    gmi_mean = jnp.mean(per["gmi"]) * self.grad_metric_iso_lambda
                    total = total + gmi_mean
                    aux["grad_metric_iso"] = gmi_mean

            return total, aux

        def latent_batch_losses(trainable, scene_idx):
            """Covariance / GMM-prior on the batch's (unique) latent rows —
            computed once per full batch (ref: train_deep_sdf.py:737-764)."""
            total = 0.0
            aux = {}
            lat_rows = trainable["lat"][scene_idx]
            if use_cov:
                cov = self.lambda_cov * covariance_loss(lat_rows)
                total = total + cov
                aux["covariance"] = cov
            if use_gmm:
                nll, gmm_aux = gmm_prior_loss(
                    trainable["gmm"], lat_rows,
                    min_sigma=self.gmm_min_sigma, learn_pi=self.gmm_learn_pi,
                )
                gl = self.gmm_lambda * nll
                total = total + gl
                aux["gmm"] = gl
                aux.update(gmm_aux)
            return total, aux

        def step(state, opt_state, pos, pc, neg, nc, scene_idx, key, epoch_f, lr_net, lr_lat):
            # scene_idx may carry trailing pad entries (value 0) when the
            # batch was padded to a mesh multiple; every loss term masks
            # them, so num_total and the gradients match the unpadded run.
            b_real = self.scene_per_batch
            padded = scene_idx.shape[0] != b_real
            if padded and batch_split != 1:
                raise NotImplementedError(
                    "batch_split > 1 with a mesh-padded scene batch is unsupported; "
                    "pick ScenesPerBatch divisible by the device count or batch_split=1"
                )
            num_total = b_real * P

            # CodeBound lookup-time renorm of the batch rows — REAL rows
            # only: trailing pad entries alias scene 0, and projecting it
            # when it isn't in the batch would diverge the padded run from
            # the unpadded trajectory.
            if self.code_bound is not None:
                idx_real = scene_idx[:b_real]
                rows = project_code_bound(state["lat"][idx_real], self.code_bound)
                state = dict(state, lat=state["lat"].at[idx_real].set(rows))

            sample_key, loss_key = jax.random.split(key)
            if use_fused:
                # SoA batch feeds the kernel's [components, n] input with no
                # lane-shuffling transpose (sample_sdf_batch layout="t")
                batch_t = sample_sdf_batch(
                    pos, pc, neg, nc, scene_idx, P, sample_key, layout="t"
                )  # [4, B, P]
                w_scenes = (
                    (jnp.arange(scene_idx.shape[0]) < b_real).astype(jnp.float32)
                    if padded else None
                )
                nr = b_real if padded else None

                def grad_fn(trainable, idx_chunk, data_c, k):
                    return fused_grad_fn(
                        trainable, idx_chunk, data_c, k, epoch_f, num_total,
                        weights=w_scenes, n_real=nr,
                    )

                data = batch_t
            else:
                batch = sample_sdf_batch(pos, pc, neg, nc, scene_idx, P, sample_key)  # [B, P, 4]
                n_real = b_real if padded else None

                def total_point_loss(trainable, idx_chunk, data_c, k):
                    return point_losses(
                        trainable, idx_chunk, data_c[0], data_c[1], k, epoch_f, num_total,
                        n_real=n_real,
                    )

                grad_fn = jax.grad(total_point_loss, has_aux=True)
                data = (batch[..., :3], batch[..., 3:4])

            if batch_split == 1:
                grads, aux = grad_fn(state, scene_idx, data, loss_key)
            else:
                bs = scene_idx.shape[0] // batch_split
                idx_chunks = scene_idx[: bs * batch_split].reshape(batch_split, bs)
                if use_fused:
                    data_chunks = data[:, : bs * batch_split].reshape(
                        4, batch_split, bs, P
                    ).transpose(1, 0, 2, 3)
                else:
                    data_chunks = (
                        data[0][: bs * batch_split].reshape(batch_split, bs, P, 3),
                        data[1][: bs * batch_split].reshape(batch_split, bs, P, 1),
                    )

                def scan_body(carry, inp):
                    acc = carry
                    i, idx_c, data_c = inp
                    g, a = grad_fn(state, idx_c, data_c, jax.random.fold_in(loss_key, i))
                    acc = jax.tree.map(jnp.add, acc, g)
                    return acc, a

                zero = jax.tree.map(jnp.zeros_like, state)
                grads, auxs = jax.lax.scan(
                    scan_body, zero,
                    (jnp.arange(batch_split), idx_chunks, data_chunks),
                )
                aux = jax.tree.map(jnp.sum, auxs)

            if use_cov or use_gmm:
                # pad entries excluded — batch-statistic losses (covariance,
                # GMM NLL) must see exactly the real scenes' rows
                lb_grads, lb_aux = jax.grad(latent_batch_losses, has_aux=True)(
                    state, scene_idx[:b_real]
                )
                grads = jax.tree.map(jnp.add, grads, lb_grads)
                aux.update(lb_aux)

            lr_tree = {"net": lr_net, "lat": lr_lat}
            if "gmm" in state:
                lr_tree["gmm"] = lr_lat
            # one flattened clip+Adam pass per group (the per-leaf pytree
            # update costs ~5.6 ms of kernel-launch overhead on v5e)
            new_state, new_opt, norms = fused_clip_adam(
                state, grads, opt_state, lr_tree, max_norm=self.grad_clip
            )
            if "net" in norms:
                aux["net_grad_norm"] = norms["net"]

            total = aux["sdf"] + aux["eikonal"] + aux["reg"]
            for k2 in ("iso", "grad_metric_iso", "covariance", "gmm"):
                if k2 in aux:
                    total = total + aux[k2]
            aux["total"] = total
            return new_state, new_opt, aux

        precision = self.precision

        def step_with_precision(*args):
            with jax.default_matmul_precision(precision):
                return step(*args)

        return step_with_precision

    # ------------------------------------------------------------------
    def _get_epoch_fn(self, batch_split: int, nb: int):
        """One jitted program for a WHOLE epoch: lax.scan of the train step
        over the epoch's nb batches, metrics stacked on device.

        Through the axon relay every host->device dispatch and every
        device->host fetch pays RPC latency; the per-step dispatch loop
        cost ~35 ms/epoch of client-side overhead (measured ~7 ms/step at
        4 steps/epoch) on top of the kernel. One dispatch + one packed
        metrics fetch per epoch removes it."""
        sig = (batch_split, nb)
        if sig not in self._epoch_fns:
            step = self._build_step(batch_split)
            base_key = self.base_key

            def epoch_fn(state, opt_state, pos, pc, neg, nc, idx_all, start_i,
                         epoch_f, lr_net, lr_lat):
                def body(carry, inp):
                    st, opt = carry
                    i, idx = inp
                    # same per-step key stream as the unrolled loop:
                    # fold_in(base_key, global_batch_idx) with the counter
                    # pre-incremented (resume-stable)
                    key = jax.random.fold_in(base_key, start_i + i + 1)
                    st, opt, m = step(st, opt, pos, pc, neg, nc, idx, key,
                                      epoch_f, lr_net, lr_lat)
                    return (st, opt), m

                (state, opt_state), ms = jax.lax.scan(
                    body, (state, opt_state), (jnp.arange(nb), idx_all)
                )
                # post-epoch mean latent magnitude over the REAL rows,
                # folded into the packed metrics (its own host fetch would
                # pay another relay round trip per epoch)
                lat_mag = jnp.mean(
                    jnp.linalg.norm(state["lat"][: self.num_scenes], axis=1)
                )
                ms = dict(ms, lat_mag_post=jnp.broadcast_to(lat_mag, (nb,)))
                return state, opt_state, ms

            self._epoch_fns[sig] = jax.jit(epoch_fn, donate_argnums=(0, 1))
        return self._epoch_fns[sig]

    # ------------------------------------------------------------------
    def _dispatch_epoch(self, epoch: int, batch_split: int, rng: np.random.Generator):
        """Enqueue one epoch (ONE jitted scan over its batches) and return
        the un-fetched packed metrics array [K, nb] + its key order. No host
        sync happens here — jax dispatch is async."""
        lr_net = float(self.lr_schedules[0].get_learning_rate(epoch, self.loss_log_epoch))
        lr_lat = float(self.lr_schedules[1].get_learning_rate(epoch, self.loss_log_epoch))

        pos, pc, neg, nc = self.dataset.device_arrays()
        perm = rng.permutation(self.num_scenes)
        nb = self.num_scenes // self.scene_per_batch
        if nb == 0:
            raise RuntimeError(
                f"ScenesPerBatch={self.scene_per_batch} > num_scenes={self.num_scenes}"
            )
        idx_all = perm[: nb * self.scene_per_batch].reshape(nb, self.scene_per_batch)
        if self.mesh is not None:
            pad = self._batch_pad - self.scene_per_batch
            if pad:
                # pad scene ids are masked out of the loss inside the step
                idx_all = np.concatenate(
                    [idx_all, np.zeros((nb, pad), idx_all.dtype)], axis=1
                )
            from jax.sharding import NamedSharding, PartitionSpec as P

            idx_all = jax.device_put(
                jnp.asarray(idx_all), NamedSharding(self.mesh, P(None, "data"))
            )
        else:
            idx_all = jnp.asarray(idx_all)

        epoch_fn = self._get_epoch_fn(batch_split, nb)
        start_i = self.global_batch_idx
        self.global_batch_idx += nb
        self.state, self.opt_state, ms_dev = epoch_fn(
            self.state, self.opt_state, pos, pc, neg, nc, idx_all,
            jnp.int32(start_i), jnp.float32(epoch),
            jnp.float32(lr_net), jnp.float32(lr_lat),
        )
        keys = sorted(ms_dev)
        packed_dev = jnp.stack([jnp.asarray(ms_dev[k], jnp.float32) for k in keys])
        self.lr_log.append([lr_net, lr_lat])
        return keys, packed_dev, nb

    def _resolve_epoch(self, keys, packed_dev, nb):
        """Fetch one dispatched epoch's packed metrics (ONE transfer) and
        fold them into the logs; returns the mean metrics dict."""
        packed = np.asarray(packed_dev)
        for i in range(nb):
            self.loss_log.append(float(packed[keys.index("total"), i]))
        mean = {k: float(np.mean(packed[j])) for j, k in enumerate(keys)}
        self.loss_log_epoch.append(mean["total"])
        return mean

    # ------------------------------------------------------------------
    def _get_epoch_block_fn(self, batch_split: int, nb: int, n_epochs: int):
        """One jitted program for a BLOCK of n_epochs epochs: an outer
        lax.scan over epochs of the per-epoch batch scan.

        Through the axon relay every host-side device interaction is a
        blocking RPC (measured ~25 ms D2H, ~25-40 ms per scalar device_put,
        ~5 ms per dispatch on this host) — the per-epoch dispatch path makes
        ~8 of them, a ~40-60 ms/epoch host floor that dominates once the
        device step is fast (the stage-2 step sits entirely under it:
        stage2_step_breakdown.json measured step(P) flat in P — 59.5 ms at
        P=16384 vs 58.8 at P=4096 — against a 25.6 ms kernel). Batching E
        epochs into one program divides every per-epoch RPC by E: one
        schedule upload [E,3], one index upload [E,nb,B], one dispatch, one
        packed [K,E,nb] metrics fetch."""
        sig = (batch_split, nb, n_epochs)
        if sig not in self._epoch_block_fns:
            step = self._build_step(batch_split)
            base_key = self.base_key

            def block_fn(state, opt_state, pos, pc, neg, nc, idx_all, start_i, sched):
                # idx_all [E, nb, B]; sched [E, 3] = (epoch_f, lr_net, lr_lat)
                def epoch_body(carry, einp):
                    st, opt = carry
                    e_idx, idx_e, sched_e = einp

                    def body(c, binp):
                        st2, opt2 = c
                        i, idx = binp
                        # identical key stream to the per-epoch path:
                        # fold_in(base_key, global_batch_idx), pre-incremented
                        key = jax.random.fold_in(
                            base_key, start_i + e_idx * nb + i + 1
                        )
                        st2, opt2, m = step(
                            st2, opt2, pos, pc, neg, nc, idx, key,
                            sched_e[0], sched_e[1], sched_e[2],
                        )
                        return (st2, opt2), m

                    (st, opt), ms = jax.lax.scan(
                        body, (st, opt), (jnp.arange(nb), idx_e)
                    )
                    lat_mag = jnp.mean(
                        jnp.linalg.norm(st["lat"][: self.num_scenes], axis=1)
                    )
                    ms = dict(ms, lat_mag_post=jnp.broadcast_to(lat_mag, (nb,)))
                    # per-epoch per-parameter weight norms, folded into the
                    # packed metrics so train()'s param_mag_log keeps honest
                    # per-epoch values without a device fetch per epoch
                    # (ref: train_deep_sdf.py:202-208)
                    flat = jax.tree_util.tree_flatten_with_path(st["net"])[0]
                    for path, leaf in flat:
                        name = ".".join(
                            p.key if hasattr(p, "key") else str(p) for p in path
                        )
                        ms["pm_" + name] = jnp.broadcast_to(
                            jnp.linalg.norm(leaf), (nb,)
                        )
                    return (st, opt), ms

                (state, opt_state), ms = jax.lax.scan(
                    epoch_body, (state, opt_state),
                    (jnp.arange(n_epochs), idx_all, sched),
                )
                return state, opt_state, ms  # metrics [E, nb]

            self._epoch_block_fns[sig] = jax.jit(block_fn, donate_argnums=(0, 1))
        return self._epoch_block_fns[sig]

    def _dispatch_epoch_block(self, epochs, batch_split: int, rng: np.random.Generator):
        """Enqueue a block of epochs as ONE jitted program (see
        _get_epoch_block_fn). LR schedules are evaluated host-side up front —
        plateau schedules (which need each epoch's loss) are excluded by
        train_epochs before this is called."""
        E = len(epochs)
        lrs = [
            (
                float(self.lr_schedules[0].get_learning_rate(e, self.loss_log_epoch)),
                float(self.lr_schedules[1].get_learning_rate(e, self.loss_log_epoch)),
            )
            for e in epochs
        ]
        pos, pc, neg, nc = self.dataset.device_arrays()
        nb = self.num_scenes // self.scene_per_batch
        if nb == 0:
            raise RuntimeError(
                f"ScenesPerBatch={self.scene_per_batch} > num_scenes={self.num_scenes}"
            )
        idx_rows = []
        for _ in epochs:
            perm = rng.permutation(self.num_scenes)
            idx = perm[: nb * self.scene_per_batch].reshape(nb, self.scene_per_batch)
            if self.mesh is not None:
                pad = self._batch_pad - self.scene_per_batch
                if pad:
                    idx = np.concatenate([idx, np.zeros((nb, pad), idx.dtype)], axis=1)
            idx_rows.append(idx)
        idx_all = np.stack(idx_rows)  # [E, nb, B]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            idx_all = jax.device_put(
                jnp.asarray(idx_all), NamedSharding(self.mesh, P(None, None, "data"))
            )
        else:
            idx_all = jnp.asarray(idx_all)
        sched = jnp.asarray(
            np.array([[float(e), lr[0], lr[1]] for e, lr in zip(epochs, lrs)], np.float32)
        )
        block_fn = self._get_epoch_block_fn(batch_split, nb, E)
        start_i = self.global_batch_idx
        self.global_batch_idx += E * nb
        self.state, self.opt_state, ms_dev = block_fn(
            self.state, self.opt_state, pos, pc, neg, nc, idx_all,
            jnp.int32(start_i), sched,
        )
        keys = sorted(ms_dev)
        packed_dev = jnp.stack([jnp.asarray(ms_dev[k], jnp.float32) for k in keys])
        for lr in lrs:
            self.lr_log.append(list(lr))
        return keys, packed_dev, nb, E

    def _lr_needs_epoch_loss(self) -> bool:
        """Plateau schedules read the previous epoch's loss -> no pipelining."""
        return any(
            isinstance(s, StepLearningRateOnPlateauSchedule) for s in self.lr_schedules
        )

    def train_epoch(self, epoch: int, batch_split: int = 1, rng: np.random.Generator | None = None):
        """Run one epoch; returns mean metrics dict (host floats).

        The whole epoch is one dispatched program (lax.scan over batches)
        and its metrics come back in one packed transfer — through the
        relay, per-step dispatches/fetches cost ~7 ms/step at 4
        steps/epoch. For back-to-back epochs without the per-epoch
        round-trip stall, use train_epochs."""
        rng = rng or np.random.default_rng(epoch)
        return self._resolve_epoch(*self._dispatch_epoch(epoch, batch_split, rng))

    def train_epochs(self, start_epoch: int, end_epoch: int, batch_split: int = 1,
                     rng: np.random.Generator | None = None, max_in_flight: int = 2,
                     block: int | None = None):
        """Run epochs [start_epoch, end_epoch) in BLOCKS of ``block`` epochs
        per dispatched program (default MSD_EPOCH_BLOCK, 8), pipelined up to
        ``max_in_flight`` blocks deep. Blocking divides the per-epoch host
        RPC cost (uploads/dispatch/metrics fetch through the relay) by the
        block size — see _get_epoch_block_fn. Returns the list of per-epoch
        mean metrics dicts (in epoch order).

        Falls back to sequential single-epoch execution when a plateau LR
        schedule is active (its LR for epoch e+1 depends on epoch e's
        loss)."""
        from msd_tpu.train import epoch_blocks

        epochs = list(range(start_epoch, end_epoch))
        if self._lr_needs_epoch_loss():
            return [self.train_epoch(e, batch_split, rng) for e in epochs]
        rng = rng or np.random.default_rng(start_epoch)
        return epoch_blocks.run_blocked_epochs(
            self, epochs, batch_split, rng, max_in_flight, block
        )

    # ------------------------------------------------------------------
    def train(self, start_epoch: int = 1, num_epochs: int | None = None, batch_split: int = 1, eval_hooks=True):
        num_epochs = num_epochs or self.num_epochs
        specs = self.specs
        eval_train_frequency = get_spec_with_default(specs, "EvalTrainFrequency", 300)
        eval_test_frequency = get_spec_with_default(specs, "EvalTestFrequency", 500)
        rng = np.random.default_rng(get_spec_with_default(specs, "Seed", 0) + start_epoch)

        # optional jax.profiler trace of selected epochs (TPU-native
        # equivalent of the reference's wall-clock timing logs, SURVEY §5.1):
        # "ProfileEpochs": [e1, e2, ...] writes traces under
        # <exp>/TensorBoard/profile for xprof/tensorboard-profile viewing.
        profile_epochs = set(get_spec_with_default(specs, "ProfileEpochs", []) or [])
        profile_dir = os.path.join(self.experiment_directory, ws.tb_logs_dir, "profile")

        # Non-plateau schedules run in epoch BLOCKS (one dispatched program
        # per block, see _get_epoch_block_fn) between "event" epochs —
        # checkpoints, log/eval frequencies, profile epochs — which must be
        # a block's last epoch so their host-side work sees the right state.
        # timing_log gets the block mean per epoch (still seconds/epoch).
        from msd_tpu.train.epoch_blocks import block_cap as _block_cap

        use_blocks = not self._lr_needs_epoch_loss()
        block_cap = _block_cap()

        def _is_event(e):
            return (
                e in self.checkpoints
                or e % self.log_frequency == 0
                or bool(eval_hooks and eval_train_frequency and e % eval_train_frequency == 0)
                or bool(eval_hooks and eval_test_frequency and e % eval_test_frequency == 0)
            )

        epoch = start_epoch
        while epoch <= num_epochs:
            t0 = time.time()
            self.epoch = epoch
            if epoch in profile_epochs:
                with jax.profiler.trace(profile_dir):
                    means = [self.train_epoch(epoch, batch_split=batch_split, rng=rng)]
            elif not use_blocks:
                means = [self.train_epoch(epoch, batch_split=batch_split, rng=rng)]
            else:
                end = epoch
                while (
                    end < num_epochs
                    and end - epoch + 1 < block_cap
                    and not _is_event(end)
                    and (end + 1) not in profile_epochs
                ):
                    end += 1
                means = self.train_epochs(
                    epoch, end + 1, batch_split=batch_split, rng=rng,
                    block=end - epoch + 1,
                )
            per_epoch_seconds = (time.time() - t0) / len(means)

            lrs = self.lr_log[-len(means):]  # one entry per dispatched epoch
            for off, mean in enumerate(means):
                self.epoch = epoch + off
                self._post_epoch(
                    epoch + off, mean, per_epoch_seconds, lrs[off], eval_hooks,
                    eval_train_frequency, eval_test_frequency,
                )
            epoch += len(means)

        self.save_checkpoint("latest")
        self.save_logs()

    def _post_epoch(self, epoch, mean, seconds, lr_pair, eval_hooks,
                    eval_train_frequency, eval_test_frequency):
        """Per-epoch bookkeeping after training: logs, TensorBoard scalars,
        checkpoints, eval hooks (ref: train_deep_sdf.py:834-956)."""
        self.timing_log.append(seconds)

        lat_mag = mean.get("lat_mag_post")
        if lat_mag is None:
            lat_mag = float(np.mean(np.linalg.norm(self.latent_codes(), axis=1)))
        self.lat_mag_log.append(lat_mag)
        self._append_param_magnitudes(mean)

        logging.info(
            "epoch %d loss=%.6f sdf=%.6f time=%.2fs", epoch, mean["total"], mean["sdf"], seconds
        )
        w = self.writer
        w.add_scalar("Loss/train", mean["total"], epoch)
        w.add_scalar("Loss/train_sdf", mean["sdf"], epoch)
        w.add_scalar("Loss/train_reg", mean["reg"], epoch)
        if self.use_eikonal:
            w.add_scalar("Loss/train_eikonal", mean["eikonal"], epoch)
        if self.use_covariance:
            w.add_scalar("Loss/train_covariance", mean["covariance"], epoch)
        if self.use_gmm_prior:
            w.add_scalar("Loss/train_gmm", mean["gmm"], epoch)
            w.add_scalar("Loss/train_gmm_nll", mean["gmm_nll"], epoch)
            w.add_scalar("Loss/train_gmm_entropy", mean["gmm_entropy"], epoch)
        if self.use_isometry:
            w.add_scalar("Loss/train_isometry", mean["iso"], epoch)
            w.add_scalar("Loss/train_isometry_G1", mean["iso_g1"], epoch)
            w.add_scalar("Loss/train_isometry_G2", mean["iso_g2"], epoch)
        if self.use_grad_metric_iso:
            w.add_scalar("Loss/train_grad_metric_iso", mean["grad_metric_iso"], epoch)
        w.add_scalar("Learning Rate/Params", lr_pair[0], epoch)
        w.add_scalar("Learning Rate/Latent", lr_pair[1], epoch)
        w.add_scalar("Mean Latent Magnitude/train", lat_mag, epoch)
        w.add_scalar("Time/epoch (min)", seconds / 60, epoch)
        # per-parameter weight norms + aggregate grad norm
        # (ref: train_deep_sdf.py:877-888)
        for name, mag in self._param_magnitudes(mean).items():
            w.add_scalar(f"WeightsNorm/{name}", mag, epoch)
        if "net_grad_norm" in mean:
            w.add_scalar("GradsNorm/allNetParams.grad", mean["net_grad_norm"], epoch)

        if epoch in self.checkpoints:
            self.save_checkpoint(str(epoch))
        if epoch % self.log_frequency == 0:
            self.save_checkpoint("latest")
            self.save_logs()

        if eval_hooks:
            if eval_train_frequency and epoch % eval_train_frequency == 0:
                self._eval_train(epoch)
            if eval_test_frequency and epoch % eval_test_frequency == 0:
                self._eval_test(epoch)
        w.flush()

    # ------------------------------------------------------------------
    def _append_param_magnitudes(self, mean=None):
        """Per-parameter weight norms history (ref: train_deep_sdf.py:202-208).

        When the epoch's metrics dict carries pm_* entries (epoch-block
        dispatch folds per-epoch norms into the packed metrics), use those
        instead of a device fetch."""
        for name, mag in self._param_magnitudes(mean).items():
            self.param_mag_log.setdefault(name, []).append(mag)

    def _param_magnitudes(self, mean=None):
        if mean is not None and any(k.startswith("pm_") for k in mean):
            # epoch-block metrics carry this epoch's norms already — no fetch
            return {k[3:]: v for k, v in mean.items() if k.startswith("pm_")}
        flat = jax.tree_util.tree_flatten_with_path(self.state["net"])[0]
        names = [
            ".".join(p.key if hasattr(p, "key") else str(p) for p in path)
            for path, _ in flat
        ]
        # one fused program + ONE fetch (per-leaf float() fetches each pay
        # a relay round trip)
        if not hasattr(self, "_mag_fn"):
            self._mag_fn = jax.jit(
                lambda leaves: jnp.stack([jnp.linalg.norm(l) for l in leaves])
            )
        vals = np.asarray(self._mag_fn([leaf for _, leaf in flat]))
        return dict(zip(names, (float(v) for v in vals)))

    # ------------------------------------------------------------------
    def latent_codes(self) -> np.ndarray:
        """Host copy of the REAL latent rows (mesh-padding rows stripped)."""
        return np.asarray(self.state["lat"])[: self.num_scenes]

    def _strip_lat_padding(self, tree):
        if self.num_scenes_padded == self.num_scenes:
            return tree
        return dict(tree, lat=tree["lat"][: self.num_scenes])

    def _pad_lat(self, arr):
        """Zero-pad a [num_scenes, L] host array to the mesh-padded table."""
        pad = self.num_scenes_padded - self.num_scenes
        if pad == 0:
            return jnp.asarray(arr)
        arr = np.asarray(arr)
        return jnp.asarray(np.concatenate([arr, np.zeros((pad, arr.shape[1]), arr.dtype)]))

    def save_checkpoint(self, name: str):
        ckpt.save_model(self.experiment_directory, name + ".pth", self.decoder, self.state["net"], self.epoch)
        # mesh-padding rows stripped: checkpoints always carry exactly
        # num_scenes rows (and matching Adam moments) regardless of the
        # device count they were trained on
        opt_to_save = self.opt_state
        if self.num_scenes_padded != self.num_scenes:
            opt_to_save = type(self.opt_state)(
                count=self.opt_state.count,
                mu=self._strip_lat_padding(self.opt_state.mu),
                nu=self._strip_lat_padding(self.opt_state.nu),
            )
        ckpt.save_optimizer(self.experiment_directory, name + ".pth", opt_to_save, self.epoch)
        ckpt.save_latent_vectors(
            self.experiment_directory, name + ".pth",
            self.state["lat"][: self.num_scenes], self.epoch,
        )

    def save_logs(self):
        ckpt.save_logs(
            self.experiment_directory,
            self.loss_log,
            self.lr_log,
            self.timing_log,
            self.lat_mag_log,
            self.param_mag_log,
            self.epoch,
        )

    def resume(self, continue_from: str) -> int:
        """Load model/optimizer/latents/logs; returns start_epoch
        (ref: train_deep_sdf.py:467-505)."""
        lat, lat_epoch = ckpt.load_latent_vectors(
            self.experiment_directory, continue_from + ".pth",
            expected_shape=(self.num_scenes, self.latent_size),
        )
        net, model_epoch = ckpt.load_model(self.experiment_directory, continue_from, self.decoder)
        self.state = dict(self.state, net=net, lat=self._pad_lat(lat))
        # checkpoints store unpadded latent moments; load against an
        # unpadded template, then re-pad (pad rows keep zero moments)
        template = adam_init(self._strip_lat_padding(self.state))
        loaded_opt, optimizer_epoch = ckpt.load_optimizer(
            self.experiment_directory, continue_from + ".pth", template
        )
        self.opt_state = type(loaded_opt)(
            count=loaded_opt.count,
            mu={k: (self._pad_lat(v) if k == "lat" else v) for k, v in loaded_opt.mu.items()},
            nu={k: (self._pad_lat(v) if k == "lat" else v) for k, v in loaded_opt.nu.items()},
        )
        try:
            (
                self.loss_log,
                self.lr_log,
                self.timing_log,
                self.lat_mag_log,
                self.param_mag_log,
                log_epoch,
            ) = ckpt.load_logs(self.experiment_directory)
            if log_epoch != model_epoch:
                (
                    self.loss_log,
                    self.lr_log,
                    self.timing_log,
                    self.lat_mag_log,
                    self.param_mag_log,
                ) = ckpt.clip_logs(
                    self.loss_log, self.lr_log, self.timing_log,
                    self.lat_mag_log, self.param_mag_log, model_epoch,
                )
            self.loss_log_epoch = [
                float(np.mean(chunk))
                for chunk in np.array_split(self.loss_log, max(1, len(self.lr_log)))
            ] if self.loss_log else []
        except Exception:
            logging.warning("no Logs.pth found; continuing without log history")

        if not (model_epoch == optimizer_epoch and model_epoch == lat_epoch):
            raise RuntimeError(
                f"epoch mismatch: {model_epoch} vs {optimizer_epoch} vs {lat_epoch}"
            )
        for i, sched in enumerate(self.lr_schedules):
            if isinstance(sched, StepLearningRateOnPlateauSchedule) and self.lr_log:
                sched.set_state(self.lr_log[-1][i])
        self.epoch = model_epoch
        if self.mesh is not None:
            self._apply_mesh_placement()
        return model_epoch + 1

    # ------------------------------------------------------------------
    # Eval hooks (train-set mesh chamfer / test-set reconstruction) — wired
    # through msd_tpu.mesh + msd_tpu.train.reconstruct when mesh GT exists.
    def _eval_train(self, epoch):
        torus_path = get_spec_with_default(self.specs, "TorusPath", None)
        if not torus_path or not os.path.exists(str(torus_path)):
            return
        try:
            from msd_tpu import mesh as mesh_mod
            from msd_tpu.metrics.chamfer import compute_mesh_chamfer
        except ImportError:
            return
        specs = self.specs
        eval_grid_res = get_spec_with_default(specs, "EvalGridResolution", 256)
        n_eval = min(get_spec_with_default(specs, "EvalTrainSceneNumber", 10), self.num_scenes)
        dists, all_dists, compare_rows = [], [], []
        for index in range(n_eval):
            save_name = os.path.basename(self.dataset.npyfiles[index]).split(".npz")[0]
            out_dir = os.path.join(
                self.experiment_directory, ws.tb_logs_dir, ws.tb_logs_train_reconstructions, save_name
            )
            os.makedirs(out_dir, exist_ok=True)
            tri = mesh_mod.create_mesh(
                self.decoder, self.state["net"], self.state["lat"][index],
                filename=os.path.join(out_dir, f"epoch={epoch}"),
                N=eval_grid_res, return_mesh=True,
            )
            gt_path = os.path.join(str(torus_path), save_name + ".obj")
            if tri is not None and tri is not False and os.path.exists(gt_path):
                cd, per_point = compute_mesh_chamfer(gt_path, tri)
                dists.append(cd)
                all_dists.append(np.asarray(per_point))
                if len(compare_rows) < 3:
                    from msd_tpu.data.mesh_io import load_mesh

                    compare_rows.append((save_name, [load_mesh(gt_path), tri]))
        if dists:
            self.writer.add_scalar("Mean Chamfer Dist/train", float(np.mean(dists)), epoch)
            # CD-percentile violin + GT-vs-reconstruction comparison figures
            # (ref: train_deep_sdf.py:947-954 add_figure pattern)
            try:
                from msd_tpu import plotting

                fig, _ = plotting.plot_dist_violin(np.concatenate(all_dists))
                self.writer.add_figure("CD Percentiles/train dists", fig, global_step=epoch)
                if compare_rows:
                    fig = plotting.plot_mesh_comparison(compare_rows)
                    self.writer.add_figure("Reconstructions/train comparison", fig, global_step=epoch)
            except Exception as exc:
                logging.warning("eval figures skipped: %s", exc)

    def _eval_test(self, epoch):
        """Test-set eval: optimize a latent per test shape from its GT SDF
        samples, mesh it, and Chamfer against the GT mesh
        (ref: train_deep_sdf.py:958-1032)."""
        specs = self.specs
        torus_path = get_spec_with_default(specs, "TorusPath", None)
        test_split_file = get_spec_with_default(specs, "TestSplit", None)
        if not test_split_file or not os.path.exists(str(test_split_file)):
            return
        try:
            from msd_tpu import mesh as mesh_mod
            from msd_tpu.data.sdf_samples import read_sdf_samples, remove_nans
            from msd_tpu.data.splits import get_instance_filenames
            from msd_tpu.metrics.chamfer import compute_mesh_chamfer
            from msd_tpu.train.reconstruct import reconstruct_batch
        except ImportError:
            return
        test_split = load_split(test_split_file)
        filenames = get_instance_filenames(self.data_source, test_split)
        n_eval = min(get_spec_with_default(specs, "EvalTestSceneNumber", 10), len(filenames))
        steps = get_spec_with_default(specs, "EvalTestOptimizationSteps", 1000)
        eval_grid_res = get_spec_with_default(specs, "EvalGridResolution", 256)
        test_errs, dists, lat_mags, all_dists = [], [], [], []
        t0 = time.time()
        # all test latents fit in ONE vmapped device program (sharded over
        # self.mesh when training multi-chip); meshing stays per shape
        names, shapes = [], []
        for fname in filenames[:n_eval]:
            if not os.path.isfile(fname):
                continue
            pos, neg = read_sdf_samples(fname)
            shapes.append((remove_nans(pos), remove_nans(neg)))
            names.append(os.path.basename(fname).split(".npz")[0])
        if not shapes:
            return
        errs, latents = reconstruct_batch(
            self.decoder, self.state["net"], int(steps), self.latent_size,
            shapes, 0.01, 0.1, num_samples=16384, lr=5e-3, l2reg=True,
            mesh=self.mesh,
        )
        for save_name, err, latent in zip(names, errs, latents):
            test_errs.append(float(err))
            lat_mags.append(float(np.linalg.norm(np.asarray(latent))))
            out_dir = os.path.join(
                self.experiment_directory, ws.tb_logs_dir, ws.tb_logs_test_reconstructions, save_name
            )
            os.makedirs(out_dir, exist_ok=True)
            tri = mesh_mod.create_mesh(
                self.decoder, self.state["net"], latent,
                filename=os.path.join(out_dir, f"epoch={epoch}"),
                N=eval_grid_res, return_mesh=True,
            )
            if torus_path and os.path.exists(str(torus_path)):
                gt_path = os.path.join(str(torus_path), save_name + ".obj")
                if tri is not None and tri is not False and os.path.exists(gt_path):
                    cd, per_point = compute_mesh_chamfer(gt_path, tri)
                    dists.append(cd)
                    all_dists.append(np.asarray(per_point))
        if test_errs:
            self.writer.add_scalar("Loss/test", float(np.mean(test_errs)), epoch)
            self.writer.add_scalar("Mean Latent Magnitude/test", float(np.mean(lat_mags)), epoch)
        if dists:
            self.writer.add_scalar("Mean Chamfer Dist/test", float(np.mean(dists)), epoch)
            # CD-percentile violin figure (ref: train_deep_sdf.py:1026-1027)
            try:
                from msd_tpu import plotting

                fig, _ = plotting.plot_dist_violin(np.concatenate(all_dists))
                self.writer.add_figure("CD Percentiles/test dists", fig, global_step=epoch)
            except Exception as exc:
                logging.warning("test eval figures skipped: %s", exc)
        self.writer.add_scalar(
            "Time/test eval per shape (sec)", (time.time() - t0) / max(1, n_eval), epoch
        )


def main_function(experiment_directory: str, continue_from=None, batch_split: int = 1):
    trainer = Stage1Trainer(experiment_directory)
    start_epoch = 1
    if continue_from is not None:
        logging.info('continuing from "%s"', continue_from)
        start_epoch = trainer.resume(continue_from)
    logging.info("starting from epoch %d", start_epoch)
    logging.info(
        "Number of decoder parameters: %d", trainer.decoder.num_params(trainer.state["net"])
    )
    logging.info(
        "Number of shape code parameters: %d (# codes %d, code dim %d)",
        trainer.num_scenes * trainer.latent_size,
        trainer.num_scenes,
        trainer.latent_size,
    )
    try:
        trainer.train(start_epoch=start_epoch, batch_split=batch_split)
    except KeyboardInterrupt:
        # flush/close TensorBoard and save progress, like the reference's
        # interrupt handling (ref: train_deep_sdf.py:1038-1080)
        logging.error("Received KeyboardInterrupt. Cleaning up and ending training.")
    finally:
        if trainer.epoch > 0:
            trainer.save_checkpoint("latest")
            trainer.save_logs()
        if trainer._writer is not None:
            # final hparams summary (ref: train_deep_sdf.py:1053-1078)
            try:
                scalar_keys = (
                    "CodeLength", "NumEpochs", "SamplesPerScene", "ScenesPerBatch",
                    "ClampingDistance", "CodeRegularizationLambda",
                )
                hparams = {k: trainer.specs[k] for k in scalar_keys if k in trainer.specs}
                final = trainer.loss_log_epoch[-1] if trainer.loss_log_epoch else float("nan")
                trainer.writer.add_hparams(hparams, {"final_loss": final})
            except Exception:
                pass
            trainer.writer.flush()
            trainer.writer.close()
    return trainer

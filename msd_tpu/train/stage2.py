"""Stage-2 disentanglement-VAE trainer, TPU-native.

Behavioral equivalent of the reference's train_MLP_VAE_deep_sdf.py (3957
LoC), redesigned for XLA: the VAE forward, the selected VAE objective
(beta-VAE / DIP-VAE / beta-TCVAE), every enabled disentanglement loss
(SNNL cls/reg/age, attribute, leakage, cross-cov, rank, match-std,
sensitivity, DIP-covariance), and the SDF-consistency loss through the
(frozen or trainable) Stage-1 decoder run as ONE jitted step with ONE
gradient — no retain_graph / multiple-backward games
(ref: train_MLP_VAE_deep_sdf.py:2770-3150).

Label handling: the reference filters invalid (NaN / -1) labels into
dynamic-shape batches; here the losses consume a validity mask (see
msd_tpu/losses/disentangle.py). Label mixing (pseudo/real/unlabeled
ratios, ref: :2905-3004) happens host-side per batch — the label vector is
tiny.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import msd_tpu.workspace as ws
from msd_tpu.config import get_spec_with_default, note_noop_keys, resolve_spec_path
from msd_tpu.data.labels import load_labels
from msd_tpu.data.sdf_samples import SdfDataset, sample_sdf_batch
from msd_tpu.data.splits import load_split
from msd_tpu.losses import disentangle as dl
from msd_tpu.losses import vae as vl
from msd_tpu.losses.sdf import _safe_l2norm, deep_sdf_loss
from msd_tpu.lr_schedules import get_learning_rate_schedules
from msd_tpu.models import build_decoder
from msd_tpu.models.residual_mlp_vae import ResidualMLPVAE, expand_latent_to_points
from msd_tpu.utils import checkpoint as ckpt
from msd_tpu.utils.optim import adam_init, adam_update, clip_grads_by_global_norm, fused_clip_adam


def load_teacher_latents(path: str) -> np.ndarray:
    """Load Stage-1 latent codes: Embedding state dict, raw tensor, or
    id->vector dict (ref: train_MLP_VAE_deep_sdf.py:299-321)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "latent_codes" in data:
        codes = data["latent_codes"]
    else:
        codes = data
    if isinstance(codes, dict) and "weight" in codes:
        arr = codes["weight"].detach().numpy()
    elif hasattr(codes, "detach"):
        arr = codes.detach().numpy()
        if arr.ndim == 3:
            arr = arr[:, 0, :]
    elif isinstance(codes, dict):
        arr = np.stack([np.asarray(v) for v in codes.values()])
    else:
        arr = np.asarray(codes)
    return np.asarray(arr, np.float32)


class Stage2Trainer:
    def __init__(
        self,
        experiment_directory: str,
        specs: dict | None = None,
        dataset: SdfDataset | None = None,
        teacher_latents: np.ndarray | None = None,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a "data" axis — the
        scene batch (and its label vectors) shard over it, VAE/SDF params
        replicate, and XLA inserts the gradient psum over ICI; the same
        DataParallel-equivalent contract as Stage1Trainer (SURVEY §2.6)."""
        self.mesh = mesh
        self.experiment_directory = experiment_directory
        self.specs = specs if specs is not None else ws.load_experiment_specifications(experiment_directory)
        note_noop_keys(self.specs)
        specs = self.specs
        logging.info("Experiment description: \n%s", specs.get("Description", "(none)"))  # ref: train_MLP_VAE_deep_sdf.py:650
        g = lambda k, d: get_spec_with_default(specs, k, d)

        self.num_samp_per_scene = specs["SamplesPerScene"]
        self.scene_per_batch = specs["ScenesPerBatch"]
        self.clamp_dist = specs["ClampingDistance"]
        self.num_epochs = specs["NumEpochs"]
        self.grad_clip = g("GradientClipNorm", None)
        self.snapshot_frequency = specs["SnapshotFrequency"]
        self.additional_snapshots = g("AdditionalSnapshots", [])
        self.checkpoints = sorted(
            list(range(self.snapshot_frequency, self.num_epochs + 1, self.snapshot_frequency))
            + list(self.additional_snapshots)
        )
        self.log_frequency = g("LogFrequency", 100)

        # ---- teacher latents (ref: :672-689) ----
        if teacher_latents is None:
            latent_codes_path = g("PretrainedLatentPath", None) or g("LatentCodesPath", None)
            latent_codes_path = resolve_spec_path(latent_codes_path, experiment_directory)
            if latent_codes_path is None:
                raise Exception("PretrainedLatentPath or LatentCodesPath must be set in specs")
            teacher_latents = load_teacher_latents(latent_codes_path)
        self.teacher_latents = np.asarray(teacher_latents, np.float32)
        latent_dim = self.teacher_latents.shape[1]
        code_length = g("CodeLength", latent_dim)
        if code_length != latent_dim:
            raise Exception(
                f"CodeLength does not match pretrained latent dimensionality: {code_length} vs {latent_dim}"
            )
        self.latent_size = code_length

        # ---- SDF decoder (ref: :691-702) ----
        self.sdf_decoder = build_decoder(specs["NetworkArch"], self.latent_size, specs["NetworkSpecs"])
        self.train_sdf_decoder = bool(g("TrainSDFDecoder", False))
        # fused Pallas kernel for the SDF-consistency term (TPU, supported
        # decoder configs); "UseFusedSDFKernel": false opts out
        self.use_fused_sdf = bool(g("UseFusedSDFKernel", True))
        pretrained_sdf_path = g("PretrainedSDFDecoderPath", None) or g("PretrainedDecoderPath", None)
        pretrained_sdf_path = resolve_spec_path(pretrained_sdf_path, experiment_directory)
        key = jax.random.PRNGKey(g("Seed", 0))
        k_sdf, k_vae, self.base_key = jax.random.split(key, 3)
        if pretrained_sdf_path is not None:
            import torch

            data = torch.load(pretrained_sdf_path, map_location="cpu", weights_only=False)
            sd = data.get("model_state_dict", data) if isinstance(data, dict) else data
            sdf_params = self.sdf_decoder.params_from_torch_state_dict(sd)
            logging.info("Loaded pretrained SDF decoder from: %s", pretrained_sdf_path)
        else:
            sdf_params = self.sdf_decoder.init(k_sdf)

        # ---- VAE (ref: :897-932) ----
        self.vae_input_dim = g("VAEInputDim", self.latent_size)
        if self.vae_input_dim != self.latent_size:
            raise Exception("VAEInputDim must match pretrained latent size")
        self.vae_latent_dim = g("VAELatentDim", 16)
        self.use_kl = bool(g("UseKLLoss", True))
        self.encoder_type = str(g("EncoderType", "residual_mlp")).lower()
        if self.encoder_type in ("residual_mlp", "mlp", "latent", "latent_mlp"):
            self.vae_input_mode = "latent"
            self.vae = ResidualMLPVAE(
                input_dim=self.vae_input_dim,
                latent_dim=self.vae_latent_dim,
                encoder_hidden_dims=g("VAEEncoderHiddenDims", [256, 128]),
                decoder_hidden_dims=g("VAEDecoderHiddenDims", [128, 256, 256]),
                num_blocks=g("VAEBlocks", 1),
                activation=g("VAEActivation", "gelu"),
                dropout=g("VAEDropout", 0.0),
                use_layernorm=g("VAELayerNorm", True),
                use_kl=self.use_kl,
            )
        else:
            from msd_tpu.models.pointnet_vae import PointNetLatentVAE

            self.vae_input_mode = "points"
            self.vae = PointNetLatentVAE(
                latent_dim=self.vae_latent_dim,
                output_dim=self.vae_input_dim,
                encoder_type=self.encoder_type,
                decoder_hidden_dims=g("VAEDecoderHiddenDims", [128, 256, 256]),
                decoder_blocks=g("VAEBlocks", 1),
                decoder_activation=g("VAEActivation", "gelu"),
                decoder_dropout=g("VAEDropout", 0.0),
                decoder_layernorm=g("VAELayerNorm", True),
                use_kl=self.use_kl,
            )
        vae_params = self.vae.init(k_vae)
        pretrained_vae_path = resolve_spec_path(g("PretrainedVAEPath", None), experiment_directory)
        if pretrained_vae_path:
            import torch

            data = torch.load(pretrained_vae_path, map_location="cpu", weights_only=False)
            sd = data.get("vae_state_dict", data) if isinstance(data, dict) else data
            vae_params = self.vae.params_from_torch_state_dict(sd)
            logging.info("Loading pretrained VAE from: %s", pretrained_vae_path)

        # ---- objective & loss gates (ref: :707-895) ----
        self.vae_objective = str(g("VAEObjective", "beta_vae")).lower()
        self.recon_loss_type = g("VAEReconLoss", "mse")
        self.vae_recon_weight = g("VAEReconWeight", 1.0)
        self.vae_kl_weight = g("VAEKLWeight", 1.0)
        self.vae_kl_warmup_epochs = g("KLWarmupEpochs", 0)
        self.sdf_loss_weight = g("SDFLossWeight", 1.0)
        self.do_code_regularization = g("CodeRegularization", True)
        self.code_reg_lambda = g("CodeRegularizationLambda", 1e-4)
        self.code_reg_warmup_epochs = g("CodeRegularizationWarmupEpochs", 100)
        self.beta_tc = (g("BetaTC_Alpha", 1.0), g("BetaTC_Beta", 6.0), g("BetaTC_Gamma", 1.0))
        self.beta_tc_dataset_size = g("BetaTC_DatasetSize", None)
        dip_type = str(g("DIPVAEType", "ii")).lower()
        dip_objectives = {"dip_vae", "dip_vae_ii", "dip_vae2", "dip_ii", "dip2", "dip_vae_i", "dip_vae1", "dip_i", "dip1"}
        self.use_dip_objective = self.vae_objective in dip_objectives
        if self.vae_objective in ("dip_vae_ii", "dip_vae2", "dip_ii", "dip2"):
            dip_type = "ii"
        elif self.vae_objective in ("dip_vae_i", "dip_vae1", "dip_i", "dip1"):
            dip_type = "i"
        self.dip_vae_type = dip_type
        self.dip_vae_lambda_od = g("DIPVAE_LambdaOD", 1.0)
        self.dip_vae_lambda_d = g("DIPVAE_LambdaD", 1.0)

        self.guided_contrastive_loss = g("GuidedContrastiveLoss", False)
        self.attribute_loss = g("AttributeLoss", False)
        label_task_type = g("LabelTaskType", None)
        label_task_type = str(label_task_type).lower() if label_task_type is not None else None
        self.label_task_type = label_task_type
        if "SNNLType" in specs:
            self.snnl_type = str(specs["SNNLType"]).lower()
        elif label_task_type in ("classification", "class", "cls", "binary"):
            self.snnl_type = "cls"
        else:
            self.snnl_type = "reg_exact"
        self.snnl_temp = g("SNNLTemp", 181.0)
        self.snnl_weight = g("SNNLWeight", 0.5)
        self.attr_weight = g("AttributeWeight", 0.5)
        self.covariance_loss = g("CovarianceLoss", False)
        self.covariance_lambda = g("CovarianceLossLambda", 1.0)
        self.label_index = g("LabelIndex", 0)
        self.attribute_latent_index = g("AttributeLatentIndex", 0)
        self.snnl_target_dim = g("SNNLTargetDim", 0)
        self.snnl_reg_threshold = g("SNNLRegThreshold", 0.05)
        self.snnl_reg_pos_mode = g("SNNLRegPosMode", "threshold")
        self.snnl_reg_topk_frac = g("SNNLRegTopkFrac", 0.1)
        self.snnl_reg_use_adaptive_T = g("SNNLRegUseAdaptiveT", True)
        self.snnl_reg_normalize_z = g("SNNLRegNormalizeZ", True)
        self.age_snnl_reg_loss = g("AgeSNNLRegLoss", False)
        self.age_snnl_reg_weight = g("AgeSNNLRegWeight", 0.5)
        self.age_snnl_reg_label_index = g("AgeSNNLRegLabelIndex", 1)
        self.age_snnl_reg_target_dim = g("AgeSNNLRegTargetDim", 1)
        self.age_snnl_reg_temp = g("AgeSNNLRegTemp", self.snnl_temp)
        self.age_snnl_reg_threshold = g("AgeSNNLRegThreshold", self.snnl_reg_threshold)
        self.age_snnl_reg_pos_mode = g("AgeSNNLRegPosMode", self.snnl_reg_pos_mode)
        self.age_snnl_reg_topk_frac = g("AgeSNNLRegTopkFrac", self.snnl_reg_topk_frac)
        self.age_snnl_reg_use_adaptive_T = g("AgeSNNLRegUseAdaptiveT", self.snnl_reg_use_adaptive_T)
        self.age_snnl_reg_normalize_z = g("AgeSNNLRegNormalizeZ", self.snnl_reg_normalize_z)
        self.corr_leakage_loss = g("CorrLeakageLoss", False)
        self.corr_leakage_lambda = g("CorrLeakageLambda", 1.0)
        self.age_corr_leakage_loss = g("AgeCorrLeakageLoss", False)
        self.age_corr_leakage_lambda = g("AgeCorrLeakageLambda", self.corr_leakage_lambda)
        self.cross_cov_loss = g("CrossCovLoss", False)
        self.cross_cov_lambda = g("CrossCovLambda", 1.0)
        self.sensitivity_loss = g("SensitivityLoss", False)
        self.sensitivity_eps = g("SensitivityEps", 0.02)
        self.sensitivity_eta = g("SensitivityEta", 0.0025)
        self.sensitivity_weight = g("SensitivityWeight", 0.1)
        self.sensitivity_target_dim = g("SensitivityLatentIndex", 0)
        self.rank_loss = g("RankLoss", False)
        self.rank_margin = g("RankLossMargin", 0.5)
        self.rank_weight = g("RankLossWeight", 0.1)
        self.rank_target_dim = g("RankLossTargetDim", 0)
        self.rank_cn_label = g("RankLossCNLabel", 1)
        self.matchstd_loss = g("MatchStdLoss", False)
        self.matchstd_weight = g("MatchStdWeight", 0.1)
        self.matchstd_target_dim = g("MatchStdTargetDim", 0)
        self.matchstd_eps = g("MatchStdEps", 1e-6)
        self.leakage_target_dim = g("LeakageTargetDim", self.attribute_latent_index)
        self.age_leakage_target_dim = g("AgeLeakageTargetDim", self.age_snnl_reg_target_dim)

        # label mixing (ref: :817-833, :2905-3004)
        self.label_mix_enabled = g("LabelMixing", False)
        self.pseudo_labels_file = g("PseudoLabelsFile", "pseudo_label.pt")
        self.real_labels_file = g("RealLabelsFile", "labels.pt")
        self.mix_pseudo_start = float(g("LabelMixPseudoRatioStart", 1.0))
        self.mix_unlabeled_start = float(g("LabelMixUnlabeledRatioStart", 0.0))
        self.label_mix_stratified = g("LabelMixStratified", False)
        mix_real = 1.0 - self.mix_pseudo_start - self.mix_unlabeled_start
        if self.mix_pseudo_start < 0 or self.mix_unlabeled_start < 0 or mix_real < 0:
            raise RuntimeError("Invalid label mix ratios")

        self.use_labels = g("ReturnLabels", None)
        if self.use_labels is None:
            self.use_labels = (
                self.guided_contrastive_loss
                or self.attribute_loss
                or self.corr_leakage_loss
                or self.age_corr_leakage_loss
                or self.rank_loss
                or self.age_snnl_reg_loss
                or g("ComputeSAP", False)
                or g("ComputeSAPAge", False)
            )
        self.labels_filename = g("LabelsFile", "labels.pt")
        self.compute_sap = g("ComputeSAP", False)
        self.compute_sap_age = g("ComputeSAPAge", False)
        self.holdout_frac = float(g("TrainLatentHoldoutFraction", 0.0))
        self.holdout_seed = g("TrainLatentHoldoutSeed", 0)

        # ---- data ----
        self.data_source = specs["DataSource"]
        self._labels_map = None
        if self.use_labels and not (dataset is not None and dataset.labels is not None):
            # an injected dataset that already carries labels needs no file
            self._labels_map = load_labels(os.path.join(self.data_source, self.labels_filename))
        if dataset is None:
            train_split = load_split(specs["TrainSplit"])
            dataset = SdfDataset.from_split(
                self.data_source, train_split, self.num_samp_per_scene, labels=self._labels_map,
                warn_missing_labels=g("WarnMissingLabels", True),
                data_source_mesh=g("DataSourceMesh", None),
                return_surface_points=self.vae_input_mode == "points"
                and g("ReturnSurfacePoints", True),
                surface_point_count=g("SurfacePointCount", 2048),
            )
        self.dataset = dataset
        if self.vae_input_mode == "points" and dataset.surface_points is None:
            raise RuntimeError("Surface points required for point-based encoder.")

        # val/test datasets (ref: :989-1173) — loaded lazily on first eval
        self.val_split_file = g("ValSplit", None)
        self.test_split_file = g("TestSplit", None)
        self._eval_datasets = {}
        self.num_scenes = dataset.num_scenes
        if self.teacher_latents.shape[0] != self.num_scenes:
            raise Exception(
                f"num teacher latents ({self.teacher_latents.shape[0]}) != num scenes ({self.num_scenes})"
            )
        # label mixing maps (host-side)
        self.pseudo_label_arr = None
        self.real_label_arr = None
        if self.label_mix_enabled:
            from msd_tpu.data.sdf_samples import _labels_for_instances

            pseudo_map = load_labels(os.path.join(self.data_source, self.pseudo_labels_file))
            real_map = load_labels(os.path.join(self.data_source, self.real_labels_file))
            self.pseudo_label_arr = _labels_for_instances(pseudo_map, dataset.instance_ids)
            self.real_label_arr = _labels_for_instances(real_map, dataset.instance_ids)

        # metric-label maps: SAP/corr metrics may read a different labels
        # file than training (SAPCORRLabelsFile / SAPAgeCORRLabelsFile,
        # ref: train_MLP_VAE_deep_sdf.py:857-866, :1204-1217)
        self.sap_corr_labels_file = g("SAPCORRLabelsFile", "labels.pt")
        self.sap_age_corr_labels_file = g("SAPAgeCORRLabelsFile", self.sap_corr_labels_file)
        self._sap_corr_label_map = None
        self._sap_age_label_map = None
        self._metric_label_cache = {}
        sap_extra = int(g("SAPCORRExtraFrequency", 0) or 0)
        if self.compute_sap or sap_extra > 0 or self.compute_sap_age:
            self._sap_corr_label_map = self._load_metric_label_map(self.sap_corr_labels_file)
        if self.compute_sap_age:
            if self.sap_age_corr_labels_file == self.sap_corr_labels_file:
                self._sap_age_label_map = self._sap_corr_label_map
            else:
                self._sap_age_label_map = self._load_metric_label_map(self.sap_age_corr_labels_file)

        # train-latent holdout (ref: :1014-1035)
        rng = np.random.default_rng(self.holdout_seed)
        perm = rng.permutation(self.num_scenes)
        n_holdout = int(round(self.holdout_frac * self.num_scenes))
        self.holdout_indices = np.sort(perm[:n_holdout])
        self.train_indices = np.sort(perm[n_holdout:])

        # ---- optimizer (ref: :1400-1409) ----
        self.lr_schedules = get_learning_rate_schedules(specs)
        state = {"vae": vae_params}
        if self.train_sdf_decoder:
            state["sdf"] = sdf_params
            self.sdf_params_frozen = None
        else:
            self.sdf_params_frozen = sdf_params
        self.state = state
        self.opt_state = adam_init(state)
        if self.mesh is not None:
            self._apply_mesh_placement()

        self.loss_log = []
        self.loss_log_epoch = []
        self.epoch = 0
        self._writer = None
        self._epoch_fns = {}  # keyed on batch_split
        self._epoch_block_fns = {}  # keyed on (batch_split, nb, n_epochs)
        self._static_dev_inputs = None  # cached (teacher, surface, frozen_sdf)
        self.last_train_sap = None
        self.last_holdout_sap = None
        self.last_eval_metrics = None

    # ------------------------------------------------------------------
    def _load_metric_label_map(self, fname):
        """Raw id->vector map for metric labels (ref: _resolve_labels_path
        train_MLP_VAE_deep_sdf.py:491-496, _load_label_map :499-520).
        ``None`` filename → metrics skipped (ref: :1854-1856); a file equal
        to the training LabelsFile reuses its already-loaded map; a missing
        file falls back to dataset-attached labels when present (injected
        datasets), else raises like the reference."""
        if fname is None:
            return None
        if fname == self.labels_filename and self._labels_map is not None:
            return self._labels_map
        path = fname if os.path.isabs(fname) else os.path.join(self.data_source, fname)
        if not os.path.isfile(path):
            if self.dataset.labels is not None:
                logging.info(
                    "metric labels file %s not found; using dataset-attached labels", path
                )
                return None
            raise FileNotFoundError(f"labels file not found: {path}")
        return load_labels(path)

    def metric_label_matrix(self, dataset=None, age: bool = False):
        """[num_scenes, L] label matrix for SAP/corr metrics on ``dataset``
        (defaults to the train dataset), from the SAPCORRLabelsFile /
        SAPAgeCORRLabelsFile map when configured (ref: :1849-1894
        _collect_factors_codes looks metric labels up per instance), else
        the dataset-attached training labels. ``None`` → metrics skipped."""
        ds = dataset if dataset is not None else self.dataset
        label_map = self._sap_age_label_map if age else self._sap_corr_label_map
        if label_map is None:
            fname = self.sap_age_corr_labels_file if age else self.sap_corr_labels_file
            if fname is None:
                logging.warning("Metrics skipped: SAPCORRLabelsFile is missing.")
                return None
            return ds.labels
        key = (id(ds), bool(age))
        if key not in self._metric_label_cache:
            from msd_tpu.data.sdf_samples import _labels_for_instances

            self._metric_label_cache[key] = _labels_for_instances(
                label_map, ds.instance_ids, warn_missing=False
            )
        return self._metric_label_cache[key]

    # ------------------------------------------------------------------
    def _apply_mesh_placement(self):
        """Replicate VAE (+ trainable SDF) params and optimizer moments over
        the mesh; scene batches shard per step in train_epoch. When the
        scene axis is not divisible by the mesh the batch replicates, but
        the SDF-consistency term (the step's dominant FLOPs) still shards
        over the POINT axis via a sharding constraint in the step — see
        _build_step — so multi-chip speedup survives odd batch sizes."""
        from msd_tpu.parallel import leading_axis_or_replicated, replicated_sharding

        replicated = replicated_sharding(self.mesh)
        self.state = jax.device_put(self.state, replicated)
        self.sdf_params_frozen = (
            jax.device_put(self.sdf_params_frozen, replicated)
            if self.sdf_params_frozen is not None else None
        )
        self.opt_state = jax.device_put(self.opt_state, replicated)
        self._batch_sharding = leading_axis_or_replicated(
            self.mesh, self.scene_per_batch, "scene batch"
        )
        self._replicated = replicated

    # ------------------------------------------------------------------
    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir=os.path.join(self.experiment_directory, ws.tb_logs_dir))
        return self._writer

    def sdf_params(self):
        return self.state["sdf"] if self.train_sdf_decoder else self.sdf_params_frozen

    # ------------------------------------------------------------------
    def _vae_objective_fn(self, z_hat, teacher, z, mu, logvar, kl_weight):
        if self.vae_objective in ("beta_tcvae", "beta_tc", "tcvae"):
            total, recon, kl, mi, tc, dwkl = vl.beta_tcvae_loss(
                z_hat, teacher, z, mu, logvar,
                recon_weight=self.vae_recon_weight, kl_weight=kl_weight,
                tc_alpha=self.beta_tc[0], tc_beta=self.beta_tc[1], tc_gamma=self.beta_tc[2],
                recon_loss=self.recon_loss_type, dataset_size=self.beta_tc_dataset_size,
            )
            return total, recon, kl, 0.0
        if self.use_dip_objective:
            total, recon, kl, dip, _, _ = vl.dip_vae_loss(
                z_hat, teacher, mu, logvar,
                recon_weight=self.vae_recon_weight, kl_weight=kl_weight,
                dip_lambda_od=self.dip_vae_lambda_od, dip_lambda_d=self.dip_vae_lambda_d,
                dip_type=self.dip_vae_type, recon_loss=self.recon_loss_type,
            )
            return total, recon, kl, dip
        total, recon, kl = vl.vae_loss(
            z_hat, teacher, mu, logvar,
            recon_weight=self.vae_recon_weight, kl_weight=kl_weight,
            recon_loss=self.recon_loss_type,
        )
        return total, recon, kl, 0.0

    def _snnl_fn(self, mu, label_values, valid):
        if self.snnl_type in ("reg", "reg_fast", "regloss"):
            return dl.snn_reg_loss(mu, label_values, self.snnl_temp, self.snnl_reg_threshold, valid=valid)
        if self.snnl_type in ("cls", "class", "classification"):
            return dl.snn_loss_cls(
                mu, label_values, T=self.snnl_temp, target_dim=self.snnl_target_dim, valid=valid
            )
        return dl.snn_reg_loss_exact(
            mu, label_values, T=self.snnl_temp, target_dim=self.snnl_target_dim,
            threshold=self.snnl_reg_threshold, pos_mode=self.snnl_reg_pos_mode,
            topk_frac=self.snnl_reg_topk_frac, use_adaptive_T=self.snnl_reg_use_adaptive_T,
            normalize_z=self.snnl_reg_normalize_z, valid=valid,
        )

    # ------------------------------------------------------------------
    def _build_step(self, batch_split: int = 1):
        vae = self.vae
        sdf_decoder = self.sdf_decoder
        P = self.num_samp_per_scene
        clamp = self.clamp_dist
        train_sdf = self.train_sdf_decoder

        points_mode = self.vae_input_mode == "points"
        if batch_split > 1 and (self.scene_per_batch * P) % batch_split != 0:
            raise ValueError(
                f"batch_split={batch_split} must divide ScenesPerBatch*SamplesPerScene"
                f"={self.scene_per_batch * P}"
            )

        # Point-axis sharding of the SDF-consistency term: the step's FLOPs
        # are dominated by B*P points through the 8x512 SDF decoder, and
        # B*P is divisible by any mesh (P is a power of two) even when the
        # scene batch is not — so the hot term scales with chips regardless
        # of ScenesPerBatch, and the (tiny) VAE/batch-statistic losses stay
        # on whatever sharding the scene batch got (replicated when
        # non-divisible). XLA psums the decoder/VAE grads over ICI.
        shard_points = None
        if self.mesh is not None:
            from msd_tpu.parallel import batch_sharding, mesh_size

            if (self.scene_per_batch * P // batch_split) % mesh_size(self.mesh) == 0:
                shard_points = batch_sharding(self.mesh)

        # fused Pallas fwd+bwd for the SDF-consistency term (the step's
        # dominant FLOPs): one VMEM-resident kernel yields the clamped-L1
        # and dL/dz_hat (plus decoder grads when TrainSDFDecoder) — the
        # Stage-1 kernel minus the eikonal chain. Multi-chip: shard_mapped
        # over the scene axis when the batch divides the mesh
        # (MSD_FUSED_FORCE=interpret exercises it on CPU test meshes).
        fused_force = os.environ.get("MSD_FUSED_FORCE") == "interpret"
        use_fused_sdf = (
            self.use_fused_sdf
            and batch_split == 1
            and (fused_force or jax.default_backend() == "tpu")
        )
        if use_fused_sdf and self.mesh is not None:
            from msd_tpu.parallel import mesh_size

            use_fused_sdf = self.scene_per_batch % mesh_size(self.mesh) == 0
        if use_fused_sdf:
            from msd_tpu.ops.fused_train import make_fused_sdf_l1, supports_fused_train

            use_fused_sdf = supports_fused_train(sdf_decoder, P)
        self._fused_sdf_active = use_fused_sdf
        if use_fused_sdf:
            # frozen decoder (the flagship config) skips the kernel's weight
            # outer products entirely — ~1/3 of its FLOPs
            fused_kw = dict(train_net=train_sdf, mesh=self.mesh)
            if fused_force:
                fused_kw.update(dtype=jnp.float32, interpret=True)
            fused_sdf_l1 = make_fused_sdf_l1(sdf_decoder, clamp, **fused_kw)

        def loss_fn(trainable, frozen_sdf, teacher, surface_pts, pos, pc, neg, nc, scene_idx,
                    label_values, label_valid, age_values, age_valid, key,
                    kl_weight, code_reg_weight):
            aux = {}
            k_batch, k_vae, k_sens, k_cov = jax.random.split(key, 4)
            batch = sample_sdf_batch(pos, pc, neg, nc, scene_idx, P, k_batch)
            xyz = batch[..., :3]
            sdf_gt = jnp.clip(batch[..., 3:4], -clamp, clamp)

            teacher_batch = teacher[scene_idx]  # [B, L] (always the recon target)
            vae_in = surface_pts[scene_idx] if points_mode else teacher_batch
            vae_out = vae.apply(trainable["vae"], vae_in, rng=k_vae, train=True)
            mu, logvar, z, z_hat = vae_out["mu"], vae_out["logvar"], vae_out["z"], vae_out["z_hat"]

            vae_total, recon, kl, dip = self._vae_objective_fn(
                z_hat, teacher_batch, z, mu, logvar, kl_weight
            )
            aux["vae_recon"] = recon
            aux["vae_kl"] = kl
            aux["dip"] = dip
            aux["vae_lat_mag"] = jax.lax.stop_gradient(jnp.mean(jnp.linalg.norm(mu, axis=1)))

            # label losses on mu (ref: :3007-3076)
            if self.guided_contrastive_loss:
                snnl = self._snnl_fn(mu, label_values, label_valid)
                vae_total = vae_total + self.snnl_weight * snnl
                aux["snnl"] = snnl
            if self.attribute_loss:
                attr = dl.attribute_loss(mu[:, self.attribute_latent_index], label_values, valid=label_valid)
                vae_total = vae_total + self.attr_weight * attr
                aux["attr"] = attr
            if self.corr_leakage_loss:
                leak = dl.corr_leakage_penalty(mu, label_values, self.leakage_target_dim, valid=label_valid)
                vae_total = vae_total + self.corr_leakage_lambda * leak
                aux["corr_leak"] = leak
            if self.cross_cov_loss:
                cc = dl.cross_cov_penalty(mu, self.leakage_target_dim, valid=label_valid)
                vae_total = vae_total + self.cross_cov_lambda * cc
                aux["cross_cov"] = cc
            if self.rank_loss:
                rk = dl.rank_loss_z0(
                    mu, label_values, margin=self.rank_margin,
                    target_dim=self.rank_target_dim, cn_label=self.rank_cn_label, valid=label_valid,
                )
                vae_total = vae_total + self.rank_weight * rk
                aux["rank"] = rk
            if self.age_snnl_reg_loss:
                age_snnl = dl.snn_reg_loss_exact(
                    mu, age_values, T=self.age_snnl_reg_temp, target_dim=self.age_snnl_reg_target_dim,
                    threshold=self.age_snnl_reg_threshold, pos_mode=self.age_snnl_reg_pos_mode,
                    topk_frac=self.age_snnl_reg_topk_frac,
                    use_adaptive_T=self.age_snnl_reg_use_adaptive_T,
                    normalize_z=self.age_snnl_reg_normalize_z, valid=age_valid,
                )
                vae_total = vae_total + self.age_snnl_reg_weight * age_snnl
                aux["snnl_age"] = age_snnl
            if self.age_corr_leakage_loss:
                age_leak = dl.corr_leakage_penalty(mu, age_values, self.age_leakage_target_dim, valid=age_valid)
                vae_total = vae_total + self.age_corr_leakage_lambda * age_leak
                aux["age_corr_leak"] = age_leak
            if self.matchstd_loss:
                ms, std0, stdref = dl.match_std_z0(mu, self.matchstd_target_dim, self.matchstd_eps)
                vae_total = vae_total + self.matchstd_weight * ms
                aux["matchstd"] = ms
                aux["matchstd_std0"] = std0
                aux["matchstd_stdref"] = stdref
            if self.sensitivity_loss:
                decode = lambda zz: vae.decode(trainable["vae"], zz)
                sens, delta = dl.sensitivity_loss(
                    mu, decode, eps=self.sensitivity_eps, eta=self.sensitivity_eta,
                    target_dim=self.sensitivity_target_dim,
                )
                vae_total = vae_total + self.sensitivity_weight * sens
                aux["sens"] = sens
                aux["sens_delta"] = delta
            if self.covariance_loss:
                cov = vl.dip_vae_ii_loss(k_cov, mu, logvar, beta=self.covariance_lambda)
                vae_total = vae_total + cov
                aux["cov"] = cov

            # SDF-consistency through the Stage-1 decoder (ref: :3097-3138).
            # batch_split > 1 chunks the point axis with lax.scan + remat so
            # backward memory is bounded by one chunk's activations — the
            # XLA analog of the reference's per-chunk backward accumulation
            # (ref: :3104-3138); equal chunks make the mean-of-chunk-means
            # equal the reference's chunk_scale-weighted sum.
            sdf_params = trainable["sdf"] if train_sdf else frozen_sdf
            lat_pts, xyz_flat = expand_latent_to_points(z_hat, xyz)
            gt_flat = sdf_gt.reshape(-1, 1)

            def sdf_chunk_loss(lp, xp, gp):
                if shard_points is not None:
                    lp = jax.lax.with_sharding_constraint(lp, shard_points)
                    xp = jax.lax.with_sharding_constraint(xp, shard_points)
                    gp = jax.lax.with_sharding_constraint(gp, shard_points)
                pred = sdf_decoder.apply(sdf_params, jnp.concatenate([lp, xp], axis=1))
                pred = jnp.clip(pred, -clamp, clamp)
                return deep_sdf_loss(
                    pred, gp, lp,
                    code_reg_lambda=self.code_reg_lambda,
                    code_reg_weight=code_reg_weight if self.do_code_regularization else 0.0,
                )

            if use_fused_sdf:
                # per-point code reg over the expanded latents reduces to a
                # scene-level scalar: lam*w*sum_pts||z_hat||/(B*P)
                # = lam*w*sum_scenes||z_hat||/B (deep_sdf_loss semantics)
                sdf_l = fused_sdf_l1(sdf_params, z_hat, xyz, sdf_gt)
                reg_w = code_reg_weight if self.do_code_regularization else 0.0
                sdf_reg = (
                    self.code_reg_lambda * reg_w
                    * jnp.sum(_safe_l2norm(z_hat, axis=1)) / z_hat.shape[0]
                )
                sdf_total = sdf_l + sdf_reg
            elif batch_split == 1:
                sdf_total, sdf_l, sdf_reg = sdf_chunk_loss(lat_pts, xyz_flat, gt_flat)
            else:
                n = lat_pts.shape[0]
                c = n // batch_split
                chunks = (
                    lat_pts.reshape(batch_split, c, -1),
                    xyz_flat.reshape(batch_split, c, 3),
                    gt_flat.reshape(batch_split, c, 1),
                )

                def scan_body(acc, inp):
                    t, l, r = jax.checkpoint(sdf_chunk_loss)(*inp)
                    return (acc[0] + t, acc[1] + l, acc[2] + r), None

                (sdf_total, sdf_l, sdf_reg), _ = jax.lax.scan(
                    scan_body, (jnp.float32(0.0),) * 3, chunks
                )
                sdf_total, sdf_l, sdf_reg = (
                    x / batch_split for x in (sdf_total, sdf_l, sdf_reg)
                )
            aux["sdf"] = sdf_l
            aux["sdf_reg"] = sdf_reg

            total = vae_total + self.sdf_loss_weight * sdf_total
            aux["vae_total"] = vae_total
            aux["total"] = total
            if points_mode and "bn_updates" in vae_out:
                aux["bn_updates"] = jax.lax.stop_gradient(vae_out["bn_updates"])
            return total, aux

        def step(state, opt_state, frozen_sdf, teacher, surface_pts, pos, pc, neg, nc, scene_idx,
                 label_values, label_valid, age_values, age_valid, key,
                 kl_weight, code_reg_weight, lr_vae, lr_sdf):
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                state, frozen_sdf, teacher, surface_pts, pos, pc, neg, nc, scene_idx,
                label_values, label_valid, age_values, age_valid, key,
                kl_weight, code_reg_weight,
            )
            lr_tree = {"vae": lr_vae}
            if train_sdf:
                lr_tree["sdf"] = lr_sdf
            # flattened per-group clip+Adam (see utils/optim.fused_clip_adam)
            new_state, new_opt, _ = fused_clip_adam(
                state, grads, opt_state, lr_tree, max_norm=self.grad_clip,
                clip_keys=("vae", "sdf") if train_sdf else ("vae",),
            )
            bn_updates = aux.pop("bn_updates", None)
            if bn_updates is not None:
                new_state = dict(
                    new_state, vae=vae.update_bn_stats(new_state["vae"], bn_updates)
                )
            return new_state, new_opt, aux

        return step

    # ------------------------------------------------------------------
    def _get_epoch_fn(self, batch_split: int, nb: int):
        """One jitted program per epoch: lax.scan of the train step over the
        epoch's nb batches (see Stage1Trainer._get_epoch_fn — per-step
        dispatches/fetches through the relay cost ~7 ms/step at small
        steps-per-epoch)."""
        sig = (batch_split, nb)
        if sig not in self._epoch_fns:
            step = self._build_step(batch_split)
            base_key = self.base_key

            def epoch_fn(state, opt_state, frozen_sdf, teacher, surface, pos, pc, neg, nc,
                         sel_all, lv_all, valid_all, av_all, avalid_all,
                         epoch_i, kl_weight, code_reg_weight, lr_vae, lr_sdf):
                def body(carry, inp):
                    st, opt = carry
                    i, sel, lv, valid, av, avalid = inp
                    key = jax.random.fold_in(base_key, epoch_i * 100003 + i)
                    st, opt, aux = step(
                        st, opt, frozen_sdf, teacher, surface, pos, pc, neg, nc,
                        sel, lv, valid, av, avalid, key,
                        kl_weight, code_reg_weight, lr_vae, lr_sdf,
                    )
                    return (st, opt), aux

                (state, opt_state), ms = jax.lax.scan(
                    body, (state, opt_state),
                    (jnp.arange(nb), sel_all, lv_all, valid_all, av_all, avalid_all),
                )
                return state, opt_state, ms

            self._epoch_fns[sig] = jax.jit(epoch_fn, donate_argnums=(0, 1))
        return self._epoch_fns[sig]

    # ------------------------------------------------------------------
    def _batch_labels(self, scene_idx: np.ndarray, rng: np.random.Generator):
        """Host-side label selection incl. label mixing
        (ref: :2905-3004). Returns (label_values [B], valid [B],
        age_values [B], age_valid [B])."""
        b = len(scene_idx)
        nanv = np.full((b,), np.nan, np.float32)
        label_values = nanv.copy()
        if self.label_mix_enabled:
            pseudo_ratio = self.mix_pseudo_start
            unlabeled_ratio = self.mix_unlabeled_start
            real_ratio = 1.0 - pseudo_ratio - unlabeled_ratio
            if self.label_mix_stratified:
                k_real = int(round(real_ratio * b))
                k_pseudo = int(round(pseudo_ratio * b))
                if k_real + k_pseudo > b:
                    k_pseudo = max(0, b - k_real)
                perm = rng.permutation(b)
                real_mask = np.zeros(b, bool)
                pseudo_mask = np.zeros(b, bool)
                real_mask[perm[:k_real]] = True
                pseudo_mask[perm[k_real : k_real + k_pseudo]] = True
            else:
                rand = rng.random(b)
                real_mask = rand < real_ratio
                pseudo_mask = (rand >= real_ratio) & (rand < real_ratio + pseudo_ratio)
            if pseudo_mask.any():
                label_values[pseudo_mask] = self.pseudo_label_arr[scene_idx][pseudo_mask, self.label_index]
            if real_mask.any():
                label_values[real_mask] = self.real_label_arr[scene_idx][real_mask, self.label_index]
        elif self.use_labels and self.dataset.labels is not None:
            label_values = self.dataset.labels[scene_idx, self.label_index].astype(np.float32)
        valid = np.isfinite(label_values) & (label_values != -1)

        age_values = nanv.copy()
        age_valid = np.zeros(b, bool)
        if (self.age_snnl_reg_loss or self.age_corr_leakage_loss) and self.dataset.labels is not None:
            age_values = self.dataset.labels[scene_idx, self.age_snnl_reg_label_index].astype(np.float32)
            age_valid = np.isfinite(age_values) & (age_values != -1)
        return (
            np.nan_to_num(label_values),
            valid,
            np.nan_to_num(age_values),
            age_valid,
        )

    # ------------------------------------------------------------------
    def _epoch_static_inputs(self):
        """(teacher, surface, frozen_sdf) device arrays, cached — these are
        constant across training, and re-uploading them per epoch costs
        blocking relay RPCs (see Stage1Trainer._get_epoch_block_fn)."""
        if self._static_dev_inputs is None:
            teacher = jnp.asarray(self.teacher_latents)
            if self.vae_input_mode == "points":
                surface = jnp.asarray(self.dataset.surface_points, jnp.float32)
            else:
                surface = jnp.zeros((1, 1, 3), jnp.float32)  # unused placeholder
            # When the SDF decoder trains, loss_fn reads trainable["sdf"] and
            # frozen_sdf is unused — pass a scalar placeholder rather than
            # aliasing the donated state buffers (donation would invalidate
            # them).
            frozen_sdf = (
                self.sdf_params_frozen if not self.train_sdf_decoder else jnp.zeros(())
            )
            self._static_dev_inputs = (teacher, surface, frozen_sdf)
        return self._static_dev_inputs

    def _dispatch_epoch(self, epoch: int, batch_split: int, rng: np.random.Generator):
        """Enqueue one epoch (ONE jitted scan) and return the un-fetched
        packed metrics; no host sync here (jax dispatch is async)."""
        lr_vae = float(self.lr_schedules[0].get_learning_rate(epoch, self.loss_log_epoch))
        lr_sdf = float(
            (self.lr_schedules[1] if len(self.lr_schedules) > 1 else self.lr_schedules[0]).get_learning_rate(
                epoch, self.loss_log_epoch
            )
        )
        if self.use_kl:
            kl_weight = self.vae_kl_weight * vl.linear_warmup(epoch, self.vae_kl_warmup_epochs)
        else:
            kl_weight = 0.0
        if self.do_code_regularization:
            code_reg_weight = (
                1.0 if self.code_reg_warmup_epochs <= 0 else min(1.0, epoch / float(self.code_reg_warmup_epochs))
            )
        else:
            code_reg_weight = 0.0
        # kept for the eval blocks (run_eval reuses the epoch's weights,
        # ref: :3395-3401)
        self._last_kl_weight = kl_weight
        self._last_code_reg_weight = code_reg_weight
        self._last_lr_vae = lr_vae

        pos, pc, neg, nc = self.dataset.device_arrays()
        teacher, surface, frozen_sdf = self._epoch_static_inputs()
        train_idx = self.train_indices
        perm = rng.permutation(len(train_idx))
        nb = len(train_idx) // self.scene_per_batch
        if nb == 0:
            raise RuntimeError("ScenesPerBatch larger than (non-holdout) train set")
        sel_rows, lv_rows, valid_rows, av_rows, avalid_rows = [], [], [], [], []
        for bidx in range(nb):
            sel = train_idx[perm[bidx * self.scene_per_batch : (bidx + 1) * self.scene_per_batch]]
            lv, valid, av, avalid = self._batch_labels(sel, rng)
            sel_rows.append(sel)
            lv_rows.append(lv)
            valid_rows.append(valid)
            av_rows.append(av)
            avalid_rows.append(avalid)
        batch_arrays = [
            jnp.asarray(np.stack(rows))
            for rows in (sel_rows, lv_rows, valid_rows, av_rows, avalid_rows)
        ]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # same policy as the per-batch sharding: scenes shard when
            # divisible, else they replicate (the SDF point-axis constraint
            # in the step still shards the hot term)
            spec = P(None, "data") if "data" in str(self._batch_sharding.spec) else P()
            batch_arrays = [
                jax.device_put(a, NamedSharding(self.mesh, spec)) for a in batch_arrays
            ]
        epoch_fn = self._get_epoch_fn(batch_split, nb)
        self.state, self.opt_state, ms_dev = epoch_fn(
            self.state, self.opt_state, frozen_sdf, teacher, surface, pos, pc, neg, nc,
            *batch_arrays,
            jnp.int32(epoch), jnp.float32(kl_weight), jnp.float32(code_reg_weight),
            jnp.float32(lr_vae), jnp.float32(lr_sdf),
        )
        keys = sorted(ms_dev)
        packed_dev = jnp.stack([jnp.asarray(ms_dev[k], jnp.float32) for k in keys])
        return keys, packed_dev, nb

    def _resolve_epoch(self, keys, packed_dev, nb):
        packed = np.asarray(packed_dev)  # ONE packed host sync per epoch
        ti = keys.index("total")
        for i in range(nb):
            self.loss_log.append(float(packed[ti, i]))
        mean = {k: float(np.mean(packed[j])) for j, k in enumerate(keys)}
        self.loss_log_epoch.append(mean["total"])
        return mean

    # ------------------------------------------------------------------
    def _get_epoch_block_fn(self, batch_split: int, nb: int, n_epochs: int):
        """One jitted program for a BLOCK of n_epochs epochs (outer lax.scan
        over epochs of the per-epoch batch scan). Rationale and RPC-cost
        arithmetic: Stage1Trainer._get_epoch_block_fn. For stage-2 the win is
        decisive: stage2_step_breakdown.json measured the per-epoch host
        dispatch path at ~58 ms/step — flat in the point count — over a
        25.6 ms device kernel, i.e. the step was entirely host-bound."""
        sig = (batch_split, nb, n_epochs)
        if sig not in self._epoch_block_fns:
            step = self._build_step(batch_split)
            base_key = self.base_key

            def block_fn(state, opt_state, frozen_sdf, teacher, surface, pos, pc, neg, nc,
                         sel_blk, lab_blk, sched):
                # sel_blk [E, nb, B] i32; lab_blk [E, 4, nb, B] f32 rows =
                # (label_values, label_valid, age_values, age_valid);
                # sched [E, 5] = (epoch, kl_w, code_reg_w, lr_vae, lr_sdf)
                def epoch_body(carry, einp):
                    st, opt = carry
                    sel_e, lab_e, sched_e = einp
                    epoch_i = sched_e[0].astype(jnp.int32)

                    def body(c, binp):
                        st2, opt2 = c
                        i, sel, lv, valid, av, avalid = binp
                        # identical key stream to the per-epoch path
                        key = jax.random.fold_in(base_key, epoch_i * 100003 + i)
                        st2, opt2, aux = step(
                            st2, opt2, frozen_sdf, teacher, surface, pos, pc, neg, nc,
                            sel, lv, valid, av, avalid, key,
                            sched_e[1], sched_e[2], sched_e[3], sched_e[4],
                        )
                        return (st2, opt2), aux

                    (st, opt), ms = jax.lax.scan(
                        body, (st, opt),
                        (jnp.arange(nb), sel_e, lab_e[0], lab_e[1].astype(bool),
                         lab_e[2], lab_e[3].astype(bool)),
                    )
                    return (st, opt), ms

                (state, opt_state), ms = jax.lax.scan(
                    epoch_body, (state, opt_state), (sel_blk, lab_blk, sched)
                )
                return state, opt_state, ms  # metrics [E, nb]

            self._epoch_block_fns[sig] = jax.jit(block_fn, donate_argnums=(0, 1))
        return self._epoch_block_fns[sig]

    def _dispatch_epoch_block(self, epochs, batch_split: int, rng: np.random.Generator):
        """Enqueue a block of epochs as ONE jitted program: one i32 upload
        (scene selections), one f32 upload (labels/valids), one schedule
        upload, one dispatch, one packed metrics fetch. Plateau LR schedules
        are excluded by train_epochs before this is called."""
        E = len(epochs)
        sched_rows = []
        for e in epochs:
            lr_vae = float(self.lr_schedules[0].get_learning_rate(e, self.loss_log_epoch))
            lr_sdf = float(
                (self.lr_schedules[1] if len(self.lr_schedules) > 1 else self.lr_schedules[0])
                .get_learning_rate(e, self.loss_log_epoch)
            )
            if self.use_kl:
                kl_weight = self.vae_kl_weight * vl.linear_warmup(e, self.vae_kl_warmup_epochs)
            else:
                kl_weight = 0.0
            if self.do_code_regularization:
                code_reg_weight = (
                    1.0 if self.code_reg_warmup_epochs <= 0
                    else min(1.0, e / float(self.code_reg_warmup_epochs))
                )
            else:
                code_reg_weight = 0.0
            sched_rows.append([float(e), kl_weight, code_reg_weight, lr_vae, lr_sdf])
        # eval blocks reuse the last trained epoch's weights (ref: :3395-3401)
        self._last_kl_weight = sched_rows[-1][1]
        self._last_code_reg_weight = sched_rows[-1][2]
        self._last_lr_vae = sched_rows[-1][3]

        pos, pc, neg, nc = self.dataset.device_arrays()
        teacher, surface, frozen_sdf = self._epoch_static_inputs()
        train_idx = self.train_indices
        nb = len(train_idx) // self.scene_per_batch
        if nb == 0:
            raise RuntimeError("ScenesPerBatch larger than (non-holdout) train set")
        sel_blk = np.empty((E, nb, self.scene_per_batch), np.int64)
        lab_blk = np.empty((E, 4, nb, self.scene_per_batch), np.float32)
        for eidx in range(E):
            perm = rng.permutation(len(train_idx))
            for bidx in range(nb):
                sel = train_idx[perm[bidx * self.scene_per_batch : (bidx + 1) * self.scene_per_batch]]
                lv, valid, av, avalid = self._batch_labels(sel, rng)
                sel_blk[eidx, bidx] = sel
                lab_blk[eidx, :, bidx] = np.stack([lv, valid, av, avalid]).astype(np.float32)
        arrays = [jnp.asarray(sel_blk), jnp.asarray(lab_blk)]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if "data" in str(self._batch_sharding.spec):
                specs = [P(None, None, "data"), P(None, None, None, "data")]
            else:
                specs = [P(), P()]
            arrays = [
                jax.device_put(a, NamedSharding(self.mesh, s))
                for a, s in zip(arrays, specs)
            ]
        sched = jnp.asarray(np.array(sched_rows, np.float32))
        block_fn = self._get_epoch_block_fn(batch_split, nb, E)
        self.state, self.opt_state, ms_dev = block_fn(
            self.state, self.opt_state, frozen_sdf, teacher, surface, pos, pc, neg, nc,
            arrays[0], arrays[1], sched,
        )
        keys = sorted(ms_dev)
        packed_dev = jnp.stack([jnp.asarray(ms_dev[k], jnp.float32) for k in keys])
        return keys, packed_dev, nb, E

    def train_epoch(self, epoch: int, batch_split: int = 1, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng(epoch)
        return self._resolve_epoch(*self._dispatch_epoch(epoch, batch_split, rng))

    def train_epochs(self, start_epoch: int, end_epoch: int, batch_split: int = 1,
                     rng: np.random.Generator | None = None, max_in_flight: int = 2,
                     block: int | None = None):
        """Epochs in BLOCKS of ``block`` per dispatched program (default
        MSD_EPOCH_BLOCK, 8), pipelined ``max_in_flight`` blocks deep —
        blocking divides the per-epoch host RPC cost by the block size (see
        _get_epoch_block_fn). Falls back to sequential single epochs when a
        plateau LR schedule is active (it reads the previous epoch's
        loss)."""
        from msd_tpu.lr_schedules import StepLearningRateOnPlateauSchedule

        from msd_tpu.train import epoch_blocks

        epochs = list(range(start_epoch, end_epoch))
        if any(isinstance(s, StepLearningRateOnPlateauSchedule) for s in self.lr_schedules):
            return [self.train_epoch(e, batch_split, rng) for e in epochs]
        rng = rng or np.random.default_rng(start_epoch)
        return epoch_blocks.run_blocked_epochs(
            self, epochs, batch_split, rng, max_in_flight, block
        )

    # ------------------------------------------------------------------
    def compute_vae_latents(self, inputs=None, batch_size: int = 1024) -> np.ndarray:
        """Deterministic VAE mu's for every scene (exported to LatentCodes,
        ref: :1638-1659 compute_vae_latents). Point encoders consume the
        surface point clouds (ref _select_vae_inputs). ``inputs`` overrides
        the train-set default (e.g. reconstructed val/test latents)."""
        out = []
        if inputs is not None:
            inputs = jnp.asarray(inputs, jnp.float32)
        elif self.vae_input_mode == "points":
            inputs = jnp.asarray(self.dataset.surface_points, jnp.float32)
        else:
            inputs = jnp.asarray(self.teacher_latents)
        for start in range(0, inputs.shape[0], batch_size):
            chunk = inputs[start : start + batch_size]
            vae_out = self.vae.apply(self.state["vae"], chunk, rng=jax.random.PRNGKey(0), train=False)
            out.append(np.asarray(vae_out["mu"]))
        return np.concatenate(out, axis=0)

    def save_checkpoint(self, name: str):
        import torch

        d = ws.get_model_params_dir(self.experiment_directory, True)
        torch.save(
            {
                "epoch": self.epoch,
                "vae_state_dict": self.vae.params_to_torch_state_dict(self.state["vae"]),
                "sdf_decoder_state_dict": self.sdf_decoder.params_to_torch_state_dict(self.sdf_params()),
            },
            os.path.join(d, name + ".pth"),
        )
        ckpt.save_optimizer(self.experiment_directory, name + ".pth", self.opt_state, self.epoch)
        ckpt.save_latent_vectors(self.experiment_directory, name + ".pth", self.compute_vae_latents(), self.epoch)

    # reference Logs.pth key -> train_epoch metric key
    _LOG_FAMILIES = {
        "loss_epoch": "total",
        "sdf_loss_epoch": "sdf",
        "sdf_reg_epoch": "sdf_reg",
        "vae_recon_epoch": "vae_recon",
        "vae_kl_epoch": "vae_kl",
        "vae_latent_magnitude": "vae_lat_mag",
        "snnl_epoch": "snnl",
        "snnl_age_epoch": "snnl_age",
        "attr_epoch": "attr",
        "cov_epoch": "cov",
        "corr_leak_epoch": "corr_leak",
        "cross_cov_epoch": "cross_cov",
        "rank_epoch": "rank",
        "matchstd_epoch": "matchstd",
        "matchstd_std0_epoch": "matchstd_std0",
        "matchstd_stdref_epoch": "matchstd_stdref",
        "sens_epoch": "sens",
        "sens_delta_epoch": "sens_delta",
    }

    def _append_epoch_logs(self, mean: dict, lr: float, seconds: float):
        if not hasattr(self, "logs_history"):
            self.logs_history = {k: [] for k in self._LOG_FAMILIES}
            self.logs_history["learning_rate"] = []
            self.logs_history["timing"] = []
        for log_key, metric_key in self._LOG_FAMILIES.items():
            if metric_key in mean:
                self.logs_history[log_key].append(float(mean[metric_key]))
        self.logs_history["learning_rate"].append(lr)
        self.logs_history["timing"].append(seconds)

    def save_logs(self):
        """Reference-format Stage-2 Logs.pth
        (ref: train_MLP_VAE_deep_sdf.py:140-192)."""
        import torch

        hist = getattr(self, "logs_history", {})
        torch.save(
            dict(hist, epoch=self.epoch, loss=self.loss_log),
            os.path.join(self.experiment_directory, ws.logs_filename),
        )

    def load_logs(self):
        """Best-effort resume of the log histories, clipped to the resumed
        epoch (ref load_logs/clip_logs, :194-288)."""
        import torch

        path = os.path.join(self.experiment_directory, ws.logs_filename)
        if not os.path.isfile(path):
            return
        data = torch.load(path, map_location="cpu", weights_only=False)
        self.logs_history = {
            k: list(data.get(k, []))[: self.epoch]
            for k in list(self._LOG_FAMILIES) + ["learning_rate", "timing"]
        }
        self.loss_log = list(data.get("loss", []))
        self.loss_log_epoch = list(data.get("loss_epoch", []))[: self.epoch]
        n_epochs_logged = len(data.get("loss_epoch", []))
        if n_epochs_logged:
            iters = len(self.loss_log) // n_epochs_logged
            self.loss_log = self.loss_log[: iters * self.epoch]
        else:
            # Without a per-epoch log there is no iters-per-epoch divisor to
            # clip with; stale per-iteration losses cannot be attributed to
            # epochs, so drop them rather than over-retain.
            self.loss_log = []

    def resume(self, continue_from: str) -> int:
        import torch

        path = os.path.join(ws.get_model_params_dir(self.experiment_directory), continue_from + ".pth")
        data = torch.load(path, map_location="cpu", weights_only=False)
        self.state = dict(self.state, vae=self.vae.params_from_torch_state_dict(data["vae_state_dict"]))
        sdf_params = self.sdf_decoder.params_from_torch_state_dict(data["sdf_decoder_state_dict"])
        if self.train_sdf_decoder:
            self.state["sdf"] = sdf_params
        else:
            self.sdf_params_frozen = sdf_params
        self._static_dev_inputs = None  # frozen params may have changed
        try:
            self.opt_state, _ = ckpt.load_optimizer(
                self.experiment_directory, continue_from + ".pth", adam_init(self.state)
            )
        except Exception:
            logging.warning("optimizer state not loaded; reinitializing")
            self.opt_state = adam_init(self.state)
        self.epoch = data["epoch"]
        try:
            self.load_logs()
        except Exception as exc:
            logging.warning("Logs.pth not restored: %s", exc)
        return data["epoch"] + 1

    # ------------------------------------------------------------------
    def eval_latents(self, indices=None):
        """(mu, logvar) for the given scene indices (all by default)."""
        mu = self.compute_vae_latents()
        if indices is not None:
            mu = mu[np.asarray(indices)]
        return mu

    # ------------------------------------------------------------------
    # val/test split evaluation (ref: train_MLP_VAE_deep_sdf.py:415-473
    # reconstruct_latents_for_dataset + the val/test eval orchestration)
    def get_eval_dataset(self, split_label: str):
        """Lazily load the val/test SdfDataset."""
        if split_label in self._eval_datasets:
            return self._eval_datasets[split_label]
        split_file = {"val": self.val_split_file, "test": self.test_split_file}.get(split_label)
        if not split_file or not os.path.exists(str(split_file)):
            self._eval_datasets[split_label] = None
            return None
        ds = SdfDataset.from_split(
            self.data_source, load_split(split_file), self.num_samp_per_scene,
            labels=self._labels_map,
        )
        self._eval_datasets[split_label] = ds
        return ds

    def reconstruct_latents_for_dataset(self, dataset, num_iterations=None, num_samples=None, lr=None):
        """Optimize a Stage-1-style latent per shape of an eval split through
        the (frozen) SDF decoder (ref: :415-473) — all shapes in one vmapped
        device program. Returns [S, L] f32."""
        from msd_tpu.train.reconstruct import reconstruct_batch

        g = lambda k, d: get_spec_with_default(self.specs, k, d)
        num_iterations = num_iterations or g("EvalTestOptimizationSteps", 1000)
        num_samples = num_samples or g("EvalTestNumSamples", self.num_samp_per_scene)
        lr = lr or g("EvalTestLatentLR", 5e-3)
        init_std = g("EvalTestLatentInitStd", 0.01)
        l2reg = g("EvalTestLatentL2Reg", True)
        shapes = [
            (dataset.pos[i, : dataset.pos_counts[i]], dataset.neg[i, : dataset.neg_counts[i]])
            for i in range(dataset.num_scenes)
        ]
        _, latents = reconstruct_batch(
            self.sdf_decoder, self.sdf_params(), int(num_iterations), self.latent_size,
            shapes, float(init_std), self.clamp_dist,
            num_samples=int(num_samples), lr=float(lr), l2reg=bool(l2reg),
        )
        return latents.astype(np.float32)

    def eval_split(self, epoch: int, split_label: str, teacher_latents: np.ndarray, dataset):
        """SAP + correlation on an eval split: encode the reconstructed
        teacher latents with the VAE, then score mu against the split's
        labels (ref eval blocks :3433-3826)."""
        from msd_tpu.metrics import sap as sap_metric
        from msd_tpu.train.stage2_eval import _cached_mu

        # shares the per-(epoch, inputs) mu cache with the stage2_eval
        # blocks: the same teacher array is what run_eval/_codes_for see
        # as eval_latents, so this pass is usually already computed
        mu = np.asarray(_cached_mu(self, teacher_latents))
        results = {}
        label_matrix = self.metric_label_matrix(dataset)
        if label_matrix is not None:
            labels = label_matrix[:, self.label_index].astype(float)
            mask = np.isfinite(labels) & (labels != -1)
            if mask.sum() >= 4:
                try:
                    results["sap"] = sap_metric.sap(
                        labels[mask].reshape(-1, 1), mu[mask],
                        continuous_factors=self.label_task_type not in ("classification", "class", "cls", "binary"),
                        regression=self.label_task_type in ("regression", "reg", "continuous"),
                    )
                    self.writer.add_scalar(f"SAP/vae_{split_label}", results["sap"], epoch)
                except Exception as e:
                    logging.warning("SAP skipped (%s): %s", split_label, e)
                if np.std(mu[mask, 0]) > 0 and np.std(labels[mask]) > 0:
                    corr = float(np.corrcoef(mu[mask, 0], labels[mask])[0, 1])
                    results["corr"] = corr
                    self.writer.add_scalar(f"Correlation/{split_label}_latent0_label", corr, epoch)
        return results

    def train(self, start_epoch: int = 1, num_epochs: int | None = None, batch_split: int = 1):
        num_epochs = num_epochs or self.num_epochs
        rng = np.random.default_rng(get_spec_with_default(self.specs, "Seed", 0) + start_epoch)

        # Non-plateau schedules run in epoch BLOCKS (one dispatched program
        # per block, Stage1Trainer._get_epoch_block_fn rationale). Any epoch
        # that triggers host-side work — checkpoints, log saves, any
        # *Frequency-gated eval inside _run_evals — must be a block's LAST
        # epoch; every spec key ending in "Frequency" is treated as an event
        # cadence so new eval gates can never be silently skipped.
        from msd_tpu.lr_schedules import StepLearningRateOnPlateauSchedule

        from msd_tpu.train.epoch_blocks import block_cap as _block_cap

        use_blocks = not any(
            isinstance(s, StepLearningRateOnPlateauSchedule) for s in self.lr_schedules
        )
        block_cap = _block_cap()
        freqs = sorted(
            {
                int(v)
                for k, v in self.specs.items()
                if k.endswith("Frequency") and isinstance(v, (int, float)) and int(v) > 0
            }
            | {self.log_frequency}
        )

        def _is_event(e):
            return e in self.checkpoints or any(e % f == 0 for f in freqs)

        epoch = start_epoch
        while epoch <= num_epochs:
            t0 = time.time()
            self.epoch = epoch
            lr_override = None
            if not use_blocks:
                means = [self.train_epoch(epoch, batch_split=batch_split, rng=rng)]
                # plateau schedules are stateful — reuse the LR the dispatch
                # computed rather than re-evaluating the schedule
                lr_override = getattr(self, "_last_lr_vae", 0.0)
            else:
                end = epoch
                while end < num_epochs and end - epoch + 1 < block_cap and not _is_event(end):
                    end += 1
                means = self.train_epochs(
                    epoch, end + 1, batch_split=batch_split, rng=rng,
                    block=end - epoch + 1,
                )
            per_epoch_seconds = (time.time() - t0) / len(means)
            for off, mean in enumerate(means):
                self._post_epoch(epoch + off, mean, per_epoch_seconds, lr_override)
            epoch += len(means)
        self.save_checkpoint("latest")
        self.save_logs()

    def _post_epoch(self, epoch, mean, seconds, lr_vae=None):
        """Per-epoch bookkeeping: logs, TensorBoard scalars, checkpoints and
        eval blocks (ref: train_MLP_VAE_deep_sdf.py:3319-3913)."""
        self.epoch = epoch
        if lr_vae is None:
            # blocked path: non-plateau schedules only, whose LR is a pure
            # stateless function of the epoch
            lr_vae = float(self.lr_schedules[0].get_learning_rate(epoch, self.loss_log_epoch))
        self._append_epoch_logs(mean, lr_vae, seconds)
        logging.info(
            "epoch %d total=%.6f vae_recon=%.6f sdf=%.6f time=%.2fs",
            epoch, mean["total"], mean["vae_recon"], mean["sdf"], seconds,
        )
        w = self.writer
        w.add_scalar("Loss/train", mean["total"], epoch)
        w.add_scalar("Loss/train_sdf", mean["sdf"], epoch)
        w.add_scalar("Loss/train_sdf_reg", mean["sdf_reg"], epoch)
        w.add_scalar("Loss/vae_recon", mean["vae_recon"], epoch)
        w.add_scalar("Loss/vae_kl", mean["vae_kl"], epoch)
        w.add_scalar("Mean Latent Magnitude/vae_mu", mean["vae_lat_mag"], epoch)
        for k in ("snnl", "snnl_age", "attr", "cov", "corr_leak", "age_corr_leak",
                  "cross_cov", "rank", "matchstd", "sens", "dip"):
            if k in mean:
                w.add_scalar(f"Loss/{k}", mean[k], epoch)
        if epoch in self.checkpoints:
            self.save_checkpoint(str(epoch))
        if epoch % self.log_frequency == 0:
            self.save_checkpoint("latest")
            self.save_logs()
        self._run_evals(epoch)
        w.flush()

    def _eval_scene_selection(self, key: str, pool, default: int = 0):
        """Stable random subset of a scene pool, sized by a *SceneNumber spec
        (0/absent = the whole pool; ref select_indices_from_pool /
        select_mesh_indices, :1306-1317). Selected once and cached so the
        same scenes are tracked across epochs, like the reference."""
        from msd_tpu.config import get_spec_with_default as g

        if not hasattr(self, "_eval_selections"):
            self._eval_selections = {}
        pool = np.asarray(pool)
        # Key on the pool's contents, not just its length: the same spec key
        # (e.g. EvalTestSceneNumber) is used with both holdout indices and
        # test-dataset ranges, and equal lengths must not alias selections.
        cache_key = (key, pool.shape, hash(pool.tobytes()))
        if cache_key not in self._eval_selections:
            n = int(g(self.specs, key, default) or 0)
            if n <= 0 or n >= len(pool):
                sel = pool
            else:
                rng = np.random.default_rng(g(self.specs, "Seed", 0))
                sel = np.sort(rng.choice(pool, size=n, replace=False))
            self._eval_selections[cache_key] = sel
        return self._eval_selections[cache_key]

    def _run_evals(self, epoch):
        """Periodic eval blocks: per-split losses (run_eval), SAP /
        correlation / diagnosis+age tables, and mesh+Chamfer eval on train,
        holdout, val and test splits (ref: train_MLP_VAE_deep_sdf.py
        :3319-3913 eval orchestration)."""
        from msd_tpu.config import get_spec_with_default as g
        from msd_tpu.train import stage2_eval as ev

        kl_weight = getattr(self, "_last_kl_weight", 0.0)
        code_reg_weight = getattr(self, "_last_code_reg_weight", 0.0)
        # mesh generation is opt-in (EvalGridResolution or a GT mesh dir in
        # specs) — deviation from the reference's always-on 256^3 meshing,
        # which would dominate eval time for configs that never read them
        mesh_gate = ("EvalGridResolution" in self.specs) or bool(
            g(self.specs, "EvalGTMeshDir", None)
        )

        eval_train_frequency = g(self.specs, "EvalTrainFrequency", 0)
        if eval_train_frequency and epoch % eval_train_frequency == 0:
            loss_idx = self._eval_scene_selection("EvalTrainSceneNumber", self.train_indices)
            em = ev.run_eval(
                self, epoch, "eval_train", scene_indices=loss_idx,
                kl_weight=kl_weight, code_reg_weight=code_reg_weight, writer=self.writer,
            )
            if em is not None:
                self.last_eval_metrics = dict(em, split="eval_train", epoch=epoch)

            def _label_metrics(split_label, indices):
                m = ev.compute_disentanglement_metrics(self, epoch, split_label, indices, self.writer)
                ev.compute_latent_label_correlation(self, epoch, split_label, indices, self.writer)
                ev.write_diagnosis_table(self, epoch, split_label, indices)
                if self.compute_sap_age:
                    ev.write_age_table(self, epoch, split_label, indices)
                return m

            tm = _label_metrics("train", self.train_indices)
            if tm and tm.get("sap") is not None:
                self.last_train_sap = tm["sap"]
            if len(self.holdout_indices):
                hm = _label_metrics("train_holdout", self.holdout_indices)
                if hm and hm.get("sap") is not None:
                    self.last_holdout_sap = hm["sap"]
                hold_em = ev.run_eval(
                    self, epoch, "eval_train_holdout",
                    scene_indices=self._eval_scene_selection("EvalTestSceneNumber", self.holdout_indices),
                    kl_weight=kl_weight, code_reg_weight=code_reg_weight, writer=self.writer,
                )
                if hold_em is not None:
                    self.last_holdout_eval_metrics = dict(hold_em, epoch=epoch)
            mesh_idx = self._eval_scene_selection("EvalMeshTrainSceneNumber", self.train_indices, 10)
            if mesh_gate and len(mesh_idx):
                _, meshes = ev.generate_eval_meshes(
                    self, epoch, "train", mesh_idx, writer=self.writer, return_meshes=True
                )
                cd = ev.compute_chamfer_for_scenes(
                    self, epoch, "train", mesh_idx, writer=self.writer, meshes=meshes
                )
                if cd is not None:
                    logging.info("Epoch %d train chamfer: %.6f (mesh_count=%d)", epoch, cd, len(mesh_idx))

        # val/test latent re-optimization evals (ref: :415-473, :3583-3913)
        eval_test_frequency = g(self.specs, "EvalTestFrequency", 0)
        eval_val_frequency = g(self.specs, "EvalValFrequency", eval_test_frequency)
        for split_label, freq, gate_key, start_key, latent_key in (
            ("test", eval_test_frequency, "EvalTestReconstructLatents", "EvalTestStartEpoch", "TestLatentPath"),
            ("val", eval_val_frequency, "EvalValReconstructLatents", "EvalValStartEpoch", "ValLatentPath"),
        ):
            if not freq or epoch % freq != 0:
                continue
            if epoch < g(self.specs, start_key, 1):
                continue
            reconstruct_gate = g(self.specs, gate_key, False)
            latent_path = resolve_spec_path(g(self.specs, latent_key, None), self.experiment_directory)
            if not reconstruct_gate and latent_path is None:
                continue
            dataset = self.get_eval_dataset(split_label)
            if dataset is None:
                continue
            if reconstruct_gate:
                # per-shape latent optimization (ref: :415-473, :1071)
                logging.info("reconstructing %s-split latents for eval...", split_label)
                teacher = self.reconstruct_latents_for_dataset(dataset)
            else:
                # precomputed latents (TestLatentPath/ValLatentPath,
                # ref: :1052-1140)
                teacher = load_teacher_latents(latent_path)
                if teacher.shape[0] != dataset.num_scenes:
                    logging.warning(
                        "%s latents (%d) != %s scenes (%d); skipping eval",
                        latent_key, teacher.shape[0], split_label, dataset.num_scenes,
                    )
                    continue
            scene_num_key = "EvalTestSceneNumber" if split_label == "test" else "EvalValSceneNumber"
            loss_idx = self._eval_scene_selection(scene_num_key, np.arange(dataset.num_scenes))
            ev.run_eval(
                self, epoch, f"eval_{split_label}", dataset=dataset, eval_latents=teacher,
                scene_indices=loss_idx, kl_weight=kl_weight,
                code_reg_weight=code_reg_weight, writer=self.writer,
            )
            ev.compute_latent_label_correlation(
                self, epoch, split_label, loss_idx, self.writer,
                dataset=dataset, eval_latents=teacher,
            )
            ev.write_diagnosis_table(
                self, epoch, split_label, loss_idx, dataset=dataset, eval_latents=teacher
            )
            if self.compute_sap_age:
                ev.write_age_table(
                    self, epoch, f"{split_label}_age", loss_idx,
                    dataset=dataset, eval_latents=teacher,
                )
            results = self.eval_split(epoch, split_label, teacher, dataset)
            logging.info("epoch %d %s eval: %s", epoch, split_label, results)
            mesh_key = "EvalMeshTestSceneNumber" if split_label == "test" else "EvalMeshValSceneNumber"
            mesh_idx = self._eval_scene_selection(mesh_key, np.arange(dataset.num_scenes), 10)
            if mesh_gate and len(mesh_idx):
                _, meshes = ev.generate_eval_meshes(
                    self, epoch, split_label, mesh_idx, writer=self.writer,
                    dataset=dataset, eval_latents=teacher, return_meshes=True,
                )
                cd = ev.compute_chamfer_for_scenes(
                    self, epoch, split_label, mesh_idx, writer=self.writer,
                    dataset=dataset, eval_latents=teacher, meshes=meshes,
                )
                if cd is not None:
                    logging.info("Epoch %d %s chamfer: %.6f", epoch, split_label, cd)

        # lightweight extra SAP/corr + eval-loss pass between full evals
        # (SAPCORRExtraFrequency, ref: train_MLP_VAE_deep_sdf.py:3499-3560)
        extra_freq = int(g(self.specs, "SAPCORRExtraFrequency", 0) or 0)
        if extra_freq > 0 and epoch % extra_freq == 0:
            full_eval_epoch = bool(eval_train_frequency and epoch % eval_train_frequency == 0)
            if self.compute_sap and not full_eval_epoch:
                tm = ev.compute_disentanglement_metrics(
                    self, epoch, "train_extra", self.train_indices, self.writer
                )
                if tm and tm.get("sap") is not None:
                    self.last_train_sap = tm["sap"]
            if not full_eval_epoch:
                em = ev.run_eval(
                    self, epoch, "eval_train_extra",
                    scene_indices=self._eval_scene_selection("EvalTrainSceneNumber", self.train_indices),
                    kl_weight=kl_weight, code_reg_weight=code_reg_weight, writer=self.writer,
                )
                if em is not None:
                    self.last_eval_metrics = dict(em, split="eval_train_extra", epoch=epoch)
            last = self.last_eval_metrics or {}

            def _fmt(v):
                return "n/a" if v is None else "%.6f" % v

            logging.info(
                "Epoch %d extra summary: train_sdf_loss=%s train_sap=%s",
                epoch, _fmt(last.get("eval_sdf_loss")), _fmt(getattr(self, "last_train_sap", None)),
            )


def main_function(experiment_directory: str, continue_from=None, batch_split: int = 1):
    trainer = Stage2Trainer(experiment_directory)
    start_epoch = 1
    if continue_from is not None:
        logging.info('continuing from "%s"', continue_from)
        start_epoch = trainer.resume(continue_from)
    try:
        trainer.train(start_epoch=start_epoch, batch_split=int(batch_split))
    except KeyboardInterrupt:
        # flush/close TensorBoard like the reference (ref:
        # train_MLP_VAE_deep_sdf.py:3909-3913)
        logging.error("Received KeyboardInterrupt. Cleaning up and ending training.")
    finally:
        if trainer._writer is not None:
            # final hparams summary (stage-1 pattern, ref:
            # train_deep_sdf.py:1053-1078)
            try:
                scalar_keys = (
                    "CodeLength", "NumEpochs", "SamplesPerScene", "ScenesPerBatch",
                    "ClampingDistance", "VAELatentDim", "VAEReconWeight", "VAEKLWeight",
                    "SDFLossWeight", "SNNLWeight", "CorrLeakageLambda",
                )
                hparams = {k: trainer.specs[k] for k in scalar_keys if k in trainer.specs}
                final = {
                    "final_loss": trainer.loss_log_epoch[-1] if trainer.loss_log_epoch else float("nan")
                }
                if getattr(trainer, "last_holdout_sap", None) is not None:
                    final["final_holdout_sap"] = trainer.last_holdout_sap
                if getattr(trainer, "last_train_sap", None) is not None:
                    final["final_train_sap"] = trainer.last_train_sap
                trainer.writer.add_hparams(hparams, final)
            except Exception:
                pass
            trainer.writer.flush()
            trainer.writer.close()
    return trainer

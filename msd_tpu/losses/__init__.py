from msd_tpu.losses.sdf import (  # noqa: F401
    clamped_l1_sum,
    code_regularization,
    eikonal_loss,
    deep_sdf_loss,
)
from msd_tpu.losses.stage1 import (  # noqa: F401
    covariance_loss,
    gmm_prior_init,
    gmm_prior_loss,
    isometry_loss,
    grad_metric_isotropy_loss,
    select_near_surface_points,
)

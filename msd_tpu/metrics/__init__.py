"""Mesh / point-cloud metrics.

Dispatcher matching the reference's compute_metric
(ref: deep_sdf/metrics/__init__.py:9-25).
"""

from msd_tpu.metrics.chamfer import (  # noqa: F401
    compute_chamfer,
    compute_mesh_chamfer,
)
from msd_tpu.metrics.emd import compute_emd  # noqa: F401
from msd_tpu.metrics.normal_consistency import mesh_normal_consistency  # noqa: F401


def compute_metric(gt_mesh=None, gen_mesh=None, num_mesh_samples: int = 30000, metric: str = "chamfer"):
    """gt_mesh / gen_mesh: path or (verts, faces) tuple.

    metric in {chamfer, hausdorff, normal_consistency}.
    """
    import numpy as np

    from msd_tpu.data.mesh_io import load_mesh
    from msd_tpu.ops.sampling import sample_mesh_surface

    def as_mesh(m):
        if isinstance(m, str):
            return load_mesh(m)
        return m

    if metric == "chamfer":
        return compute_mesh_chamfer(gt_mesh, gen_mesh, num_mesh_samples=num_mesh_samples)
    if metric == "hausdorff":
        gv, gf = as_mesh(gt_mesh)
        rv, rf = as_mesh(gen_mesh)
        a = sample_mesh_surface(gv, gf, num_mesh_samples, np.random.default_rng(0))[0]
        b = sample_mesh_surface(rv, rf, num_mesh_samples, np.random.default_rng(1))[0]
        from scipy.spatial import cKDTree

        d1 = cKDTree(b).query(a)[0].max()
        d2 = cKDTree(a).query(b)[0].max()
        return float(max(d1, d2))
    if metric == "normal_consistency":
        rv, rf = as_mesh(gen_mesh)
        return mesh_normal_consistency(rv, rf)
    raise ValueError(f"unknown metric {metric}")

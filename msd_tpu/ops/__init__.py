from msd_tpu.ops.marching_cubes import marching_tetrahedra  # noqa: F401
from msd_tpu.ops.sampling import sample_mesh_surface, triangle_areas  # noqa: F401

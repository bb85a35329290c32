from msd_tpu.data.splits import (  # noqa: F401
    load_split,
    get_instance_filenames,
    create_split_files,
)
from msd_tpu.data.sdf_samples import (  # noqa: F401
    read_sdf_samples,
    remove_nans,
    SdfDataset,
    sample_sdf_batch,
    unpack_sdf_samples,
)
from msd_tpu.data.labels import load_labels  # noqa: F401
from msd_tpu.data import mesh_io  # noqa: F401

from scenedreamer_tpu.ops.pe import positional_encoding  # noqa: F401
from scenedreamer_tpu.ops.compositing import (  # noqa: F401
    cumsum_exclusive, volume_rendering_relu)
from scenedreamer_tpu.ops.sampling import sample_depth  # noqa: F401
from scenedreamer_tpu.ops.hashgrid import (  # noqa: F401
    HashGridSpec, hashgrid_encode, init_hashgrid_table)
from scenedreamer_tpu.ops.ray_voxel import (  # noqa: F401
    camera_rays, ray_voxel_intersection)

from .sharding import make_feature_mesh, lm_solve_sharded, shard_grid
from .marginalize import marginalize_old_qr_sharded
from .frame_step import vio_frame_step_sharded, triangulate_sharded
from .kf_axis import make_kf_mesh, segmented_trajectory_solve

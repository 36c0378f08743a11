from .pnp import pnp_bearing_gn
from .relative import solve_relative_rt
from .sfm import global_sfm
from .alignment import visual_imu_alignment
from .ex_rotation import ExtrinsicRotationCalibrator

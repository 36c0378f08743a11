import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
sys.path.insert(0, "tests")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from _bearing_harness import make_landmarks, run_bearing_stream
from lfvio_tpu.runtime.synthetic import SyntheticWorld, make_synthetic_pal_camera
from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig

cam = make_synthetic_pal_camera(dtype=jnp.float64)
world = SyntheticWorld(camera=cam, traj_freq=0.8)
pts = make_landmarks()
for dur in (4.0, 5.0, 6.0):
    est = Estimator(EstimatorConfig(n_feature_slots=64, estimate_td=True, solver_dtype=jnp.float64))
    run_bearing_stream(est, world, pts, duration=dur, frame_rate=20.0, td_true=0.005)
    print(f"dur={dur}: td={est.td:.5f} err={abs(est.td-0.005)*1e3:.2f}ms", flush=True)

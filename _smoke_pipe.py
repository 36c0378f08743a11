"""Quick CPU smoke of the pipelined path (short stream, small frames)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import time
import numpy as np
import jax.numpy as jnp

from lfvio_tpu.runtime.synthetic import SyntheticWorld, make_synthetic_pal_camera, SYN_MIN_R, SYN_MAX_R
from lfvio_tpu.runtime.tracker import FrontEnd
from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
from lfvio_tpu.runtime.pipeline import VioPipeline
from lfvio_tpu.runtime.evaluation import ate_rmse

t0 = time.time()
cam = make_synthetic_pal_camera(dtype=jnp.float32)
world = SyntheticWorld(camera=cam)
fe = FrontEnd(cam, (world.height, world.width), max_cnt=120, min_dist=15, n_slots=160,
              annulus=(world.width/2, world.height/2, SYN_MAX_R, SYN_MIN_R),
              equalize=False, dtype=jnp.float32)
est = Estimator(EstimatorConfig(n_feature_slots=256, solver_dtype=jnp.float32))
pipe = VioPipeline(fe, est)
stream = world.generate(duration=5.0, frame_rate=15.0, imu_rate=200.0)
times, traj_p, traj_q = pipe.run(stream, lambda t: world.render(t))
print("init:", est.solver_flag == est.NON_LINEAR, "frames:", len(times), flush=True)
assert est.solver_flag == est.NON_LINEAR, "init failed"
gt_p = np.stack([world.pose(t)[0] for t in times])
ate, n = ate_rmse(times, traj_p, times, gt_p)
print(f"ATE {ate:.3f} m over {len(times)} frames; wall {time.time()-t0:.0f}s", flush=True)
assert np.isfinite(ate) and ate < 1.2
print("SMOKE OK", flush=True)

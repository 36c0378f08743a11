"""Attribute per-frame wall time: tracker / estimator / imu / other."""
import sys, time
import numpy as np

T0 = time.perf_counter()
def log(m):
    print(f"[prof +{time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
from lfvio_tpu.runtime.synthetic import SyntheticWorld, fit_inverse_poly, _np_quat_to_mat
from lfvio_tpu.cam import ScaramuzzaCamera
from lfvio_tpu.runtime.tracker import FrontEnd
from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
from lfvio_tpu.runtime.pipeline import VioPipeline

log(f"backend={jax.default_backend()}")
W, H = 1280, 960
base = np.array([-2.445239e2, 0.0, 1.748610e-3, -1.757770e-6, 4.475965e-9])
inv_poly = fit_inverse_poly(base, max_rho=510.0)
cam = ScaramuzzaCamera(
    poly=jnp.asarray(base, jnp.float32), inv_poly=jnp.asarray(inv_poly, jnp.float32),
    C=jnp.asarray(1.0, jnp.float32), D=jnp.asarray(0.0, jnp.float32),
    E=jnp.asarray(0.0, jnp.float32),
    cx=jnp.asarray(W/2.0, jnp.float32), cy=jnp.asarray(H/2.0, jnp.float32),
)
world = SyntheticWorld(camera=cam, width=W, height=H)
stream = world.generate(6.0, 15.0, 200.0)
frames = {}
for item in stream:
    if item[0] == "frame":
        p, q = world.pose(item[1])
        frames[item[1]] = world._render_u8(
            jnp.asarray(_np_quat_to_mat(q), jnp.float32), jnp.asarray(p, jnp.float32))
jax.block_until_ready(list(frames.values()))
log("frames rendered")

fe = FrontEnd(cam, (H, W), max_cnt=200, min_dist=20, n_slots=256,
              annulus=(W/2.0, H/2.0, 500.0*0.95, 160.0), equalize=True, dtype=jnp.float32)
est = Estimator(EstimatorConfig(n_feature_slots=256, solver_dtype=jnp.float32))
pipe = VioPipeline(fe, est)

# Monkeypatch timing
t_acc = {"fe": 0.0, "est": 0.0, "imu": 0.0, "tmp": 0.0}
n_acc = {"fe": 0, "est": 0, "imu": 0, "tmp": 0}
orig_fe = fe.process_arrays
orig_est = est.process_image_arrays
orig_imu = est.process_imu
orig_tmp = pipe._update_tmp_state
def wrap(key, fn):
    def f(*a, **k):
        t = time.perf_counter()
        r = fn(*a, **k)
        t_acc[key] += time.perf_counter() - t
        n_acc[key] += 1
        return r
    return f
fe.process_arrays = wrap("fe", orig_fe)
est.process_image_arrays = wrap("est", orig_est)
est.process_imu = wrap("imu", orig_imu)
pipe._update_tmp_state = wrap("tmp", orig_tmp)

t_split = 6.0 * 0.6
warm = [it for it in stream if it[1] <= t_split]
rest = [it for it in stream if it[1] > t_split]
for it in warm:
    if it[0] == "imu":
        pipe.feed_imu(it[1], it[2], it[3])
    else:
        pipe.feed_frame(it[1], frames[it[1]])
log(f"warmup done init={'ok' if est.solver_flag == est.NON_LINEAR else 'NO'}")
for k in t_acc: t_acc[k] = 0.0; n_acc[k] = 0

n_frames = sum(1 for it in rest if it[0] == "frame")
t0 = time.perf_counter()
for it in rest:
    if it[0] == "imu":
        pipe.feed_imu(it[1], it[2], it[3])
    else:
        pipe.feed_frame(it[1], frames[it[1]])
elapsed = time.perf_counter() - t0
log(f"timed: {n_frames} frames in {elapsed:.2f}s = {n_frames/elapsed:.2f} fps")
other = elapsed - sum(t_acc.values())
for k in t_acc:
    log(f"  {k}: {t_acc[k]:.2f}s total, n={n_acc[k]}, {1e3*t_acc[k]/max(n_acc[k],1):.2f} ms/call, {1e3*t_acc[k]/n_frames:.1f} ms/frame")
log(f"  other: {other:.2f}s = {1e3*other/n_frames:.1f} ms/frame")

# Break down estimator internals on a few more frames: time _solve_odometry phases
import lfvio_tpu.runtime.estimator as E

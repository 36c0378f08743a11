"""Fine-grained stage attribution for fe/est over the tunnel."""
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

acc = {}
def tick(key, t):
    acc[key] = acc.get(key, 0.0) + (time.perf_counter() - t)

# Instrument FrontEnd.process_arrays stages by monkeypatching internals.
orig_process = fe.process_arrays.__func__
def process_instr(self, img, t, publish=True):
    t0 = time.perf_counter()
    img_dev = jnp.asarray(img); tick("fe.upload", t0)
    valid = self.ids >= 0
    if self.prev_pyr is None:
        return orig_process(self, img, t, publish)
    t0 = time.perf_counter()
    self.key, sub = jax.random.split(self.key); tick("fe.keysplit", t0)
    t0 = time.perf_counter()
    pyr = self._pre(img_dev); tick("fe.pre_dispatch", t0)
    t0 = time.perf_counter()
    outs = self._step(self.prev_pyr, pyr, jnp.asarray(self.pos, self.dtype),
                      jnp.asarray(valid), sub, publish=publish)
    tick("fe.step_dispatch", t0)
    t0 = time.perf_counter()
    outs = jax.device_get(outs); tick("fe.get", t0)
    t0 = time.perf_counter()
    pts_next, status, bearings, new_pts, new_ok, new_bearings = outs
    pts_next = pts_next.astype(np.float64)
    status = status & valid
    bearings = bearings.astype(np.float64)
    failed = valid & ~status
    self.ids[failed] = -1
    self.track_cnt[failed] = 0
    self.prev_has_bearing[failed] = False
    self.pos[status] = pts_next[status]
    valid = self.ids >= 0
    self.track_cnt[valid] += 1
    cur_bearing = np.where(valid[:, None], bearings, 0.0)
    has_prev = self.prev_has_bearing & valid
    if publish:
        n_alive = int(valid.sum())
        n_new = min(self.max_cnt - n_alive, self.N - n_alive)
        if n_new > 0:
            free = np.where(~valid)[0]
            sel = np.where(new_ok)[0][:n_new][: len(free)]
            slots = free[: len(sel)]
            self.pos[slots] = new_pts[sel].astype(np.float64)
            self.ids[slots] = np.arange(self.next_id, self.next_id + len(sel))
            self.next_id += len(sel)
            self.track_cnt[slots] = 1
            cur_bearing[slots] = new_bearings[sel].astype(np.float64)
            has_prev[slots] = False
            valid = self.ids >= 0
    dt = t - self.prev_time if self.prev_time is not None else 0.0
    vels = np.zeros((self.N, 3))
    if dt > 0:
        vels[has_prev] = (cur_bearing[has_prev] - self.prev_bearing[has_prev]) / dt
    pub_mask = valid & (self.track_cnt > 1) if publish else None
    self.prev_pyr = pyr
    self.prev_time = t
    self.prev_bearing = cur_bearing
    self.prev_has_bearing = valid.copy()
    tick("fe.host", t0)
    if not publish:
        return None
    return self.ids.copy(), cur_bearing, vels, self.pos[:, 1].copy(), pub_mask

import types
fe.process_arrays = types.MethodType(process_instr, fe)

# Instrument estimator._solve_odometry stages.
import dataclasses as _dc
orig_solve = est._solve_odometry.__func__
from lfvio_tpu.geom import host as hg
def solve_instr(self):
    from lfvio_tpu.backend.state import WINDOW
    if self.frame_count < WINDOW:
        return
    sd = self.cfg.solver_dtype
    t0 = time.perf_counter()
    dts, accs, gyrs, a0l, g0l, imu_valid = self._padded_window_arrays()
    state = self._device_state()
    grid = self._device_grid()
    prior = self.prior if self.prior is not None else self._empty_prior()
    has_depth = jnp.asarray(self.fm.depth > 0)
    if self.failure_occur:
        origin_p0 = self.last_P0
        origin_q0 = hg.mat_to_quat(self.last_R0)
        self.failure_occur = False
    else:
        origin_p0, origin_q0 = self.Ps[0], self.Qs[0]
    ups = (jnp.asarray(dts, sd), jnp.asarray(accs, sd), jnp.asarray(gyrs, sd),
           jnp.asarray(a0l, sd), jnp.asarray(g0l, sd), jnp.asarray(imu_valid))
    tick("est.upload", t0)
    t0 = time.perf_counter()
    out, pre, sqrt_info, imu_ok, rn, rvalid, c0, c1 = self._solve_step(
        state, grid, *ups, prior, has_depth,
        jnp.asarray(origin_p0, sd), jnp.asarray(origin_q0, sd))
    tick("est.solve_dispatch", t0)
    t0 = time.perf_counter()
    if self.marg_old:
        new_prior = self._marg_old(out, grid, pre, sqrt_info, imu_ok, prior)
    else:
        new_prior = self._marg_new(out, prior)
    tick("est.marg_dispatch", t0)
    self.prior = new_prior
    t0 = time.perf_counter()
    host = jax.device_get((out.p, out.q, out.v, out.ba, out.bg,
                           out.tic, out.qic, out.td, out.inv_depth))
    tick("est.get", t0)
    t0 = time.perf_counter()
    self._write_back(*host)
    tick("est.writeback", t0)

est._solve_odometry = types.MethodType(solve_instr, est)

t_split = 6.0 * 0.6
warm = [it for it in stream if it[1] <= t_split]
rest = [it for it in stream if it[1] > t_split]
for it in warm:
    if it[0] == "imu":
        pipe.feed_imu(it[1], it[2], it[3])
    else:
        pipe.feed_frame(it[1], frames[it[1]])
log(f"warmup done init={'ok' if est.solver_flag == est.NON_LINEAR else 'NO'}")
acc.clear()

n_frames = sum(1 for it in rest if it[0] == "frame")
t0 = time.perf_counter()
for it in rest:
    if it[0] == "imu":
        pipe.feed_imu(it[1], it[2], it[3])
    else:
        pipe.feed_frame(it[1], frames[it[1]])
elapsed = time.perf_counter() - t0
log(f"timed: {n_frames} frames in {elapsed:.2f}s = {n_frames/elapsed:.2f} fps")
tot = 0.0
for k, v in sorted(acc.items()):
    log(f"  {k}: {1e3*v/n_frames:7.1f} ms/frame")
    tot += v
log(f"  [sum]: {1e3*tot/n_frames:.1f} ms/frame; unattributed {1e3*(elapsed-tot)/n_frames:.1f} ms/frame")

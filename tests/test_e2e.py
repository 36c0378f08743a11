"""End-to-end VIO on the synthetic PAL world: render → track → initialize →
sliding-window solve → trajectory, evaluated against exact ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-long e2e runs; default suite skips

from lfvio_tpu.runtime.synthetic import SyntheticWorld, make_synthetic_pal_camera, SYN_MIN_R, SYN_MAX_R
from lfvio_tpu.runtime.tracker import FrontEnd
from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
from lfvio_tpu.runtime.pipeline import VioPipeline
from lfvio_tpu.runtime.evaluation import ate_rmse


@pytest.fixture(scope="module")
def world():
    cam = make_synthetic_pal_camera(dtype=jnp.float64)
    return SyntheticWorld(camera=cam)


def test_synthetic_render_and_track(world):
    """Tracker sanity on rendered frames: most features should track between
    consecutive synthetic frames."""
    fe = FrontEnd(
        world.camera, (world.height, world.width),
        max_cnt=120, min_dist=15, n_slots=160,
        annulus=(world.width / 2, world.height / 2, SYN_MAX_R, SYN_MIN_R),
        equalize=False, dtype=jnp.float32,
    )
    f0 = fe.process(world.render(0.0), 0.0)
    f1 = fe.process(world.render(1 / 15), 1 / 15)
    assert f1 is not None and len(f1) > 60, len(f1) if f1 else 0
    # Bearings should be unit and span the negative half-plane.
    bs = np.stack([v[0] for v in f1.values()])
    np.testing.assert_allclose(np.linalg.norm(bs, axis=-1), 1.0, atol=1e-5)
    assert (bs[:, 2] < 0).any() and (bs[:, 2] > 0).any()


def test_e2e_vio_ate(world):
    """Full pipeline on synthetic data: initialization must succeed and the
    aligned ATE must stay well below the trajectory scale (~1.6 m amplitude).

    Accuracy note: the 41x41 KLT window averages the curved PAL flow field
    (~0.6 px mean bias vs exact ray-traced flow, matching OpenCV's tracker
    on the same frames); the small-window level-0 refinement
    (FrontEnd refine_win=15, round 4) cuts it to ~0.18 px, which took the
    measured ATE on this scene from ~0.58 m to ~0.11 m."""
    fe = FrontEnd(
        world.camera, (world.height, world.width),
        max_cnt=120, min_dist=15, n_slots=160,
        annulus=(world.width / 2, world.height / 2, SYN_MAX_R, SYN_MIN_R),
        equalize=False, dtype=jnp.float32,
    )
    est = Estimator(EstimatorConfig(
        n_feature_slots=256,
        solver_dtype=jnp.float64,
    ))
    pipe = VioPipeline(fe, est)
    stream = world.generate(duration=7.0, frame_rate=15.0, imu_rate=200.0)
    times, traj_p, traj_q = pipe.run(stream, lambda t: world.render(t))

    assert est.solver_flag == est.NON_LINEAR, "initialization failed"
    assert len(times) > 35, len(times)

    gt_p = np.stack([world.pose(t)[0] for t in times])
    ate, n = ate_rmse(times, traj_p, times, gt_p)
    assert np.isfinite(ate)
    # Measured 0.106 m (f64, lag 1) / 0.110 m (lag 2) on this scene.
    assert ate < 0.25, f"ATE {ate:.3f} m too large"


def test_high_rate_odometry(world):
    """IMU-rate propagated odometry between solver updates
    (estimator_node.cpp predict/update): published at ~IMU rate once
    NON_LINEAR, and staying near the solved trajectory."""
    fe = FrontEnd(
        world.camera, (world.height, world.width),
        max_cnt=120, min_dist=15, n_slots=160,
        annulus=(world.width / 2, world.height / 2, SYN_MAX_R, SYN_MIN_R),
        equalize=False, dtype=jnp.float32,
    )
    est = Estimator(EstimatorConfig(n_feature_slots=256, solver_dtype=jnp.float64))
    seen = []
    pipe = VioPipeline(fe, est, on_odometry=lambda t, p, q, v: seen.append(t))
    stream = world.generate(duration=6.0, frame_rate=15.0, imu_rate=200.0)
    times, traj_p, traj_q = pipe.run(stream, lambda t: world.render(t))
    assert est.solver_flag == est.NON_LINEAR

    hr = pipe.high_rate
    assert len(hr) > 100, len(hr)
    assert len(seen) == len(hr)
    t_hr = np.asarray([h[0] for h in hr])
    # High-rate output is denser than the solver output.
    assert len(hr) > 3 * len(times)
    # Strictly increasing timestamps.
    assert (np.diff(t_hr) > 0).all()
    # Propagated positions stay near ground truth (bounded drift between
    # solver updates; alignment-free check against the solved trajectory).
    err = []
    for t, p, q, v in hr[::10]:
        k = np.argmin(np.abs(np.asarray(times) - t))
        err.append(np.linalg.norm(p - traj_p[k]))
    assert np.median(err) < 0.5, np.median(err)

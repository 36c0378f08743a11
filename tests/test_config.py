"""Rig-YAML config ingestion (parameters.cpp:42-139 equivalent) and the
stream-restart wiring (feature_tracker_node.cpp:38-48 →
estimator_node.cpp:176-195)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lfvio_tpu.runtime.config import load_rig_yaml

def _poly_blocks():
    """Consistent forward/inverse polynomials (the synthetic PAL rig's)."""
    from lfvio_tpu.runtime.synthetic import fit_inverse_poly

    base = np.array([-2.445239e2, 0.0, 1.748610e-3, -1.757770e-6, 4.475965e-9])
    poly = base / 0.4 ** np.arange(5)
    inv = fit_inverse_poly(poly)
    fwd = "\n".join(f"   p{i}: {poly[i]:.12e}" for i in range(5))
    bwd = "\n".join(f"   p{i}: {inv[i]:.12e}" for i in range(20))
    return fwd, bwd


_FWD, _BWD = _poly_blocks()

RIG_YAML = f"""%YAML:1.0
model_type: scaramuzza
camera_name: pal
image_width: 512
image_height: 384
poly_parameters:
{_FWD}
inv_poly_parameters:
{_BWD}
affine_parameters:
   ac: 1.0
   ad: 0.0
   ae: 0.0
   cx: 256.0
   cy: 192.0
estimate_extrinsic: 1
extrinsicRotation: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [-1.0, 0.0, 0.0,
           0.0,-1.0, 0.0,
           0.0, 0.0, 1.0]
extrinsicTranslation: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [0.0, 0.0, 0.03]
max_cnt: 150
min_dist: 18
freq: 10
equalize: 1
center_x: 256.0
center_y: 192.0
max_r: 190
min_r: 64
max_solver_time: 0.04
max_num_iterations: 6
keyframe_parallax: 10.0
acc_n: 0.03
gyr_n: 0.012
acc_w: 0.05
gyr_w: 0.002
g_norm: 9.805
estimate_td: 1
td: -0.008
rolling_shutter: 1
rolling_shutter_tr: 0.033
"""


def test_load_rig_yaml_fields():
    rig = load_rig_yaml(RIG_YAML)
    assert rig.image_width == 512 and rig.image_height == 384
    assert rig.max_cnt == 150 and rig.min_dist == 18 and rig.freq == 10.0
    assert rig.annulus == (256.0, 192.0, 190.0, 64.0)
    assert rig.max_num_iterations == 6
    assert (rig.acc_n, rig.gyr_n, rig.acc_w, rig.gyr_w) == (
        0.03, 0.012, 0.05, 0.002
    )
    assert rig.g_norm == 9.805
    assert rig.estimate_extrinsic == 1
    np.testing.assert_allclose(rig.ric, np.diag([-1.0, -1.0, 1.0]))
    np.testing.assert_allclose(rig.tic, [0.0, 0.0, 0.03])
    assert rig.estimate_td and rig.td == -0.008
    assert rig.rolling_shutter and rig.rolling_shutter_tr == 0.033


def test_pipeline_from_yaml_builds_and_configures():
    import tempfile

    from lfvio_tpu.runtime.pipeline import VioPipeline
    from lfvio_tpu.cam import ScaramuzzaCamera

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(RIG_YAML)
        path = f.name
    try:
        pipe = VioPipeline.from_yaml(path, n_slots=64)
    finally:
        os.unlink(path)
    assert isinstance(pipe.fe.camera, ScaramuzzaCamera)
    assert pipe.fe.max_cnt == 150 and pipe.fe.min_dist == 18
    assert pipe.freq == 10.0 and pipe.td == -0.008
    cfg = pipe.est.cfg
    assert cfg.estimate_td and cfg.estimate_extrinsic
    assert not cfg.calib_extrinsic_rotation
    assert cfg.max_iterations == 6
    assert cfg.imu_noise.acc_n == 0.03 and cfg.imu_noise.gyr_w == 0.002
    assert cfg.rolling_shutter_tr == 0.033 and cfg.image_rows == 384
    np.testing.assert_allclose(pipe.est.tic, [0.0, 0.0, 0.03])
    # camera round trip through the built camera on the annulus
    cam = pipe.fe.camera
    pts = jnp.asarray([[330.0, 200.0], [140.0, 260.0]])
    rays = cam.lift_projective(pts)
    back = cam.space_to_plane(rays)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=0.2)


def test_reference_yaml_parses_if_present():
    """Parity check against the actual vendored reference rig config."""
    path = "/root/reference/config/mindvision/mindvision.yaml"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference tree not present")
    rig = load_rig_yaml(path)
    assert rig.image_width == 1280 and rig.image_height == 960
    assert rig.annulus is not None and rig.annulus[2] == 500.0
    assert rig.estimate_extrinsic == 1
    assert rig.estimate_td is True and abs(rig.td - (-0.008)) < 1e-12
    cam = rig.make_camera()
    # The PAL annulus must span the negative half-plane.
    pts = jnp.asarray([[1130.0, 486.0], [840.0, 486.0]])  # outer/inner radius
    rays = np.asarray(cam.lift_projective(pts))
    rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    assert rays[0, 2] < 0 < rays[1, 2]


@pytest.mark.slow
def test_stream_restart_resets_everything():
    """A >1 s frame gap must restart tracker + estimator (reference restart
    topic semantics)."""
    from lfvio_tpu.runtime.synthetic import (
        SyntheticWorld, make_synthetic_pal_camera, SYN_MAX_R, SYN_MIN_R,
    )
    from lfvio_tpu.runtime.tracker import FrontEnd
    from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
    from lfvio_tpu.runtime.pipeline import VioPipeline

    cam = make_synthetic_pal_camera()
    world = SyntheticWorld(camera=cam)
    fe = FrontEnd(
        cam, (world.height, world.width), max_cnt=60, min_dist=15, n_slots=64,
        annulus=(world.width / 2, world.height / 2, SYN_MAX_R, SYN_MIN_R),
        equalize=False, dtype=jnp.float32,
    )
    est = Estimator(EstimatorConfig(n_feature_slots=64))
    pipe = VioPipeline(fe, est)

    stream = world.generate(duration=0.3, frame_rate=10.0, imu_rate=100.0)
    pipe.run(stream, lambda t: world.render(t))
    assert est.frame_count > 0
    assert (fe.ids >= 0).sum() > 20

    # Frame after a 5 s gap → full restart, then the system keeps running.
    t_gap = 5.5
    pipe.feed_imu(t_gap - 0.01, *world.imu_sample(t_gap - 0.01))
    pipe.feed_frame(t_gap, world.render(t_gap))
    assert pipe.n_restarts == 1
    assert est.frame_count == 0 and est.solver_flag == est.INITIAL
    pipe.feed_imu(t_gap + 0.05, *world.imu_sample(t_gap + 0.05))
    pipe.feed_imu(t_gap + 0.1, *world.imu_sample(t_gap + 0.1))
    pipe.feed_frame(t_gap + 0.1, world.render(t_gap + 0.1))
    pipe.feed_imu(t_gap + 0.15, *world.imu_sample(t_gap + 0.15))
    # Host id bookkeeping lags dispatch by the pipeline depth; flush the
    # in-flight frames before inspecting it.
    pipe.flush()
    assert (fe.ids >= 0).sum() > 20  # tracking resumed
    # Backwards timestamp also restarts.
    pipe.feed_frame(t_gap - 1.0, world.render(t_gap - 1.0))
    assert pipe.n_restarts == 2

"""Dataset readers, checkpoint/resume, panorama remap."""

import numpy as np
import pytest

from lfvio_tpu.runtime.datasets import read_euroc_groundtruth
from lfvio_tpu.runtime.evaluation import ate_rmse, rpe_stats

REF_GT = "/root/reference/benchmark_publisher/config/V1_02_medium/data.csv"


def test_read_reference_groundtruth_csv():
    import os

    if not os.path.exists(REF_GT):
        pytest.skip("reference GT not present")
    t, p, q = read_euroc_groundtruth(REF_GT)
    assert len(t) > 1000
    assert np.all(np.diff(t) > 0)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=2e-4)
    # Plausible indoor trajectory scale.
    assert 0.5 < np.ptp(p[:, 0]) < 50


def test_ate_of_gt_against_itself_is_zero():
    import os

    if not os.path.exists(REF_GT):
        pytest.skip("reference GT not present")
    t, p, _ = read_euroc_groundtruth(REF_GT)
    ate, n = ate_rmse(t[::50], p[::50], t, p)
    assert ate < 1e-9
    # Perturbed by a rigid transform: still ~0 after alignment.
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    ate2, _ = ate_rmse(t[::50], p[::50] @ R.T + [5, -2, 1], t, p)
    assert ate2 < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
    from lfvio_tpu.runtime.checkpoint import save_checkpoint, load_checkpoint

    rng = np.random.default_rng(0)
    est = Estimator(EstimatorConfig(n_feature_slots=64, solver_dtype=jnp.float64))
    est.Ps[:] = rng.standard_normal((11, 3))
    est.Vs[:] = rng.standard_normal((11, 3))
    est.solver_flag = est.NON_LINEAR
    est.frame_count = 10
    est.gravity = np.array([0, 0, 9.81])
    est.imu_buf[3] = [(0.005, rng.standard_normal(3), rng.standard_normal(3))
                      for _ in range(7)]
    est.fm.feature_id[:5] = np.arange(5)
    est.fm.valid[:5, 2:7] = True
    est.fm.depth[:5] = 4.2
    # Per-observation camera ids (dual-PAL) must survive a save/resume —
    # a silent reset to camera 0 would bind camera-1 observations to the
    # wrong extrinsic in every projection factor (round-4 advisory).
    est.fm.cam[:5, 2:7] = np.tile([0, 1, 1, 0, 1], (5, 1))

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, est)

    est2 = Estimator(EstimatorConfig(n_feature_slots=64, solver_dtype=jnp.float64))
    load_checkpoint(path, est2)
    np.testing.assert_allclose(est2.Ps, est.Ps)
    np.testing.assert_allclose(est2.Vs, est.Vs)
    assert est2.solver_flag == est.NON_LINEAR
    assert est2.frame_count == 10
    assert len(est2.imu_buf[3]) == 7
    np.testing.assert_allclose(est2.imu_buf[3][2][1], est.imu_buf[3][2][1])
    np.testing.assert_allclose(est2.fm.depth[:5], 4.2)
    np.testing.assert_array_equal(est2.fm.cam[:5, 2:7], est.fm.cam[:5, 2:7])
    assert est2.prior is None


def test_panorama_remap_roundtrip():
    """Pano remap of a synthetic PAL render must reproduce the world texture:
    the pano pixel for a direction equals the source pixel that direction
    projects to."""
    import jax.numpy as jnp
    from lfvio_tpu.runtime.synthetic import SyntheticWorld, make_synthetic_pal_camera
    from lfvio_tpu.runtime.panorama import PanoramaRemapper

    cam = make_synthetic_pal_camera(dtype=jnp.float64)
    world = SyntheticWorld(camera=cam)
    img = world.render(0.0)
    remap = PanoramaRemapper(cam, img.shape, pano_width=256, pano_height=64,
                             lat_min_deg=-35.0, lat_max_deg=35.0)
    pano = np.asarray(remap.remap(img.astype(np.float32)))
    assert pano.shape == (64, 256)
    # The annulus maps to valid pano content: most pixels non-zero & in range
    nz = (pano > 1.0).mean()
    assert nz > 0.7, nz
    assert pano.max() <= 255.0 and pano.min() >= 0.0
    # Spot-check: center row (lat=0) pixel vs direct projection sample.
    ph, pw = pano.shape
    lon = -np.pi + 2 * np.pi * (pw // 4) / pw
    d = np.array([np.cos(lon), np.sin(lon), 0.0])
    pix = np.asarray(cam.space_to_plane(jnp.asarray(d)))
    src_val = img[int(round(pix[1])), int(round(pix[0]))]
    assert abs(pano[ph // 2, pw // 4] - src_val) < 25.0

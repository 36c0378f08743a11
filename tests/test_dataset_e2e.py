"""End-to-end from an ON-DISK EuRoC-layout dataset directory: the file
readers (runtime/datasets.py — the replacement for the reference's ROS-bag
ingestion + benchmark_publisher GT replay) feed the real pipeline and the
trajectory is scored against the ground-truth CSV read back through the
same reader the benchmark path uses."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from lfvio_tpu.runtime.synthetic import SyntheticWorld, make_synthetic_pal_camera
from lfvio_tpu.runtime.tracker import FrontEnd
from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
from lfvio_tpu.runtime.pipeline import VioPipeline
from lfvio_tpu.runtime.datasets import (
    euroc_stream, run_sequence, read_euroc_groundtruth,
)
from lfvio_tpu.runtime.evaluation import ate_rmse


def _write_euroc_dir(root, world, duration=6.0, frame_rate=15.0,
                     imu_rate=200.0):
    cv2 = pytest.importorskip("cv2")
    mav0 = os.path.join(root, "mav0")
    img_dir = os.path.join(mav0, "cam0", "data")
    gt_dir = os.path.join(mav0, "state_groundtruth_estimate0")
    os.makedirs(img_dir)
    os.makedirs(os.path.join(mav0, "imu0"))
    os.makedirs(gt_dir)

    n_imu = int(duration * imu_rate) + 1
    ts = np.arange(n_imu) / imu_rate
    acc, om = world.imu_batch(ts)
    with open(os.path.join(mav0, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,"
                "a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for k in range(n_imu):
            f.write(f"{int(ts[k] * 1e9)},"
                    f"{om[k][0]},{om[k][1]},{om[k][2]},"
                    f"{acc[k][0]},{acc[k][1]},{acc[k][2]}\n")

    n_frames = int(duration * frame_rate)
    with open(os.path.join(mav0, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for k in range(n_frames):
            t = k / frame_rate + 1e-4
            tns = int(t * 1e9)
            fname = f"{tns}.png"
            img = world.render(t)
            cv2.imwrite(os.path.join(img_dir, fname),
                        np.clip(img, 0, 255).astype(np.uint8))
            f.write(f"{tns},{fname}\n")

    gt_t = np.arange(0, duration, 0.02)
    gt_p, gt_q = world.pose_batch(gt_t)
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z\n")
        for k in range(len(gt_t)):
            f.write(f"{int(gt_t[k] * 1e9)},"
                    f"{gt_p[k][0]},{gt_p[k][1]},{gt_p[k][2]},"
                    f"{gt_q[k][0]},{gt_q[k][1]},{gt_q[k][2]},{gt_q[k][3]}\n")
    return mav0


def test_euroc_directory_end_to_end(tmp_path):
    from lfvio_tpu.runtime.synthetic import SYN_MIN_R, SYN_MAX_R

    cam = make_synthetic_pal_camera(dtype=jnp.float64)
    world = SyntheticWorld(camera=cam)
    mav0 = _write_euroc_dir(str(tmp_path), world)

    fe = FrontEnd(
        cam, (world.height, world.width),
        max_cnt=120, min_dist=15, n_slots=160,
        annulus=(world.width / 2, world.height / 2, SYN_MAX_R, SYN_MIN_R),
        equalize=False, dtype=jnp.float32,
    )
    est = Estimator(EstimatorConfig(
        n_feature_slots=256, solver_dtype=jnp.float64,
    ))
    pipe = VioPipeline(fe, est)
    run_sequence(pipe, euroc_stream(mav0))
    pipe.flush()

    assert est.solver_flag == est.NON_LINEAR, "init failed from disk stream"
    assert len(est.times) > 25

    gt_t, gt_p, _gt_q = read_euroc_groundtruth(
        os.path.join(mav0, "state_groundtruth_estimate0", "data.csv")
    )
    ate, n = ate_rmse(np.asarray(est.times), np.asarray(est.traj_p),
                      gt_t, gt_p)
    assert n > 25 and np.isfinite(ate)
    # PNG-quantized (uint8) images + disk round trip: same gate as the
    # in-memory e2e.
    assert ate < 0.25, f"ATE {ate:.3f} m from on-disk EuRoC-layout stream"

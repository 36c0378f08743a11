"""Estimator checkpoint / resume.

The reference has no state persistence (SURVEY.md §5: window state + marg
prior are <1 MB — trivially serializable). This module snapshots the full
estimator state (window arrays, feature table, prior, IMU buffers) to one
.npz so a crashed/preempted run resumes exactly where it stopped.
"""

from __future__ import annotations

import numpy as np

PRIOR_FIELDS = (
    "J", "r0", "x0_p", "x0_q", "x0_v", "x0_ba", "x0_bg",
    "x0_tic", "x0_qic", "x0_td", "valid",
)


def save_checkpoint(path: str, est):
    # A deferred solve still in flight must land before snapshotting
    # (pipelined mode — see Estimator.process_image_arrays defer_solve).
    while getattr(est, "_pending", None) is not None:
        est.finalize_solve()
    return _save_checkpoint(path, est)


def _save_checkpoint(path: str, est):
    """Snapshot an Estimator to `path` (.npz)."""
    fm = est.fm
    data = dict(
        Ps=est.Ps, Qs=est.Qs, Vs=est.Vs, Bas=est.Bas, Bgs=est.Bgs,
        tic=est.tic, qic=est.qic, td=np.float64(est.td),
        frame_count=np.int64(est.frame_count),
        solver_flag=np.int64(est.solver_flag),
        headers=est.headers,
        acc_0=est.acc_0, gyr_0=est.gyr_0,
        first_imu=np.bool_(est.first_imu),
        fm_bearing=fm.bearing, fm_velocity=fm.velocity, fm_td=fm.td_obs,
        fm_valid=fm.valid, fm_anchor=fm.anchor, fm_id=fm.feature_id,
        fm_depth=fm.depth, fm_cam=fm.cam,
        gravity=np.asarray(est.gravity if est.gravity is not None else np.zeros(3)),
        has_gravity=np.bool_(est.gravity is not None),
    )
    # IMU interval buffers (ragged -> flattened with counts).
    counts = np.asarray([len(b) for b in est.imu_buf], np.int64)
    if counts.sum() > 0:
        flat = np.concatenate(
            [np.asarray([(d, *a, *g) for (d, a, g) in b]).reshape(-1, 7)
             for b in est.imu_buf if b]
        )
    else:
        flat = np.zeros((0, 7))
    data["imu_counts"] = counts
    data["imu_flat"] = flat
    # Hot-path padded mirrors (incl. interval-start samples, which are not
    # recoverable from the ragged lists alone).
    data["imu_dts"] = est._imu_dts
    data["imu_accs"] = est._imu_accs
    data["imu_gyrs"] = est._imu_gyrs
    data["imu_n"] = est._imu_n
    data["imu_sumdt"] = est._imu_sumdt
    data["imu_a0"] = est._imu_a0
    data["imu_g0"] = est._imu_g0
    if est.prior is not None:
        for f in PRIOR_FIELDS:
            data[f"prior_{f}"] = np.asarray(getattr(est.prior, f))
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, est):
    """Restore a saved snapshot into an Estimator (same configuration)."""
    import jax.numpy as jnp
    from ..backend.state import PriorFactor

    z = np.load(path, allow_pickle=False)
    est.Ps[:] = z["Ps"]; est.Qs[:] = z["Qs"]; est.Vs[:] = z["Vs"]
    est.Bas[:] = z["Bas"]; est.Bgs[:] = z["Bgs"]
    est.tic = z["tic"].copy(); est.qic = z["qic"].copy()
    est.td = float(z["td"])
    est.frame_count = int(z["frame_count"])
    est.solver_flag = int(z["solver_flag"])
    est.headers[:] = z["headers"]
    est.acc_0 = z["acc_0"].copy(); est.gyr_0 = z["gyr_0"].copy()
    est.first_imu = bool(z["first_imu"])
    est.gravity = z["gravity"].copy() if bool(z["has_gravity"]) else None
    fm = est.fm
    fm.bearing[:] = z["fm_bearing"]; fm.velocity[:] = z["fm_velocity"]
    fm.td_obs[:] = z["fm_td"]; fm.valid[:] = z["fm_valid"]
    fm.anchor[:] = z["fm_anchor"]; fm.feature_id[:] = z["fm_id"]
    fm.depth[:] = z["fm_depth"]
    # Per-observation camera ids (multi-camera rigs). Absent in pre-r5
    # checkpoints -> all observations default to camera 0.
    fm.cam[:] = z["fm_cam"] if "fm_cam" in z.files else 0
    fm._id2slot = {
        int(fid): int(s) for s, fid in enumerate(fm.feature_id) if fid >= 0
    }
    counts = z["imu_counts"]; flat = z["imu_flat"]
    est.imu_buf = []
    k = 0
    for c in counts:
        buf = []
        for i in range(int(c)):
            row = flat[k]; k += 1
            buf.append((float(row[0]), row[1:4].copy(), row[4:7].copy()))
        est.imu_buf.append(buf)
    est._imu_dts[:] = z["imu_dts"]
    est._imu_accs[:] = z["imu_accs"]
    est._imu_gyrs[:] = z["imu_gyrs"]
    est._imu_n[:] = z["imu_n"]
    est._imu_sumdt[:] = z["imu_sumdt"]
    est._imu_a0[:] = z["imu_a0"]
    est._imu_g0[:] = z["imu_g0"]
    if "prior_J" in z.files:
        est.prior = PriorFactor(*[jnp.asarray(z[f"prior_{f}"]) for f in PRIOR_FIELDS])
    else:
        est.prior = None
    return est

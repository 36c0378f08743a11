"""Native C++ IO runtime: build, synchronize, and match the reference's
getMeasurements semantics (boundary interpolation, td pairing)."""

import numpy as np
import pytest

native = pytest.importorskip("lfvio_tpu.native")


def test_build_and_load():
    lib = native.load()
    assert lib is not None


def test_synchronizer_pairs_and_interpolates():
    sync = native.NativeSynchronizer(td=0.0)
    # IMU at 100 Hz, frame at t=0.095 (between samples 0.09 and 0.10).
    for k in range(10):
        t = k * 0.01
        sync.push_imu(t, [1.0 + k, 0, 0], [0, 0.1 * k, 0])
    restart = sync.push_frame(0.095, 7)
    assert not restart
    assert sync.pop() is None  # covering sample (0.10) not pushed yet
    sync.push_imu(0.10, [11.0, 0, 0], [0, 1.0, 0])
    out = sync.pop()
    assert out is not None
    ft, fid, dts, accs, gyrs = out
    assert fid == 7 and abs(ft - 0.095) < 1e-12
    # samples: 0.01..0.09 (dt 0.01 each, first consumed as interval start)
    # + one interpolated at 0.095.
    np.testing.assert_allclose(dts[:-1], 0.01, atol=1e-12)
    np.testing.assert_allclose(dts[-1], 0.005, atol=1e-12)
    # Interpolated acc at t=0.095 between acc(0.09)=10 and acc(0.10)=11: 10.5
    np.testing.assert_allclose(accs[-1, 0], 10.5, atol=1e-9)
    np.testing.assert_allclose(gyrs[-1, 1], 0.95, atol=1e-9)


def test_synchronizer_across_frames():
    sync = native.NativeSynchronizer(td=0.0)
    sync.push_imu(0.0, [0, 0, 0], [0, 0, 0])
    for k in range(1, 30):
        sync.push_imu(k * 0.01, [k * 1.0, 0, 0], [0, 0, 0])
    sync.push_frame(0.10, 1)
    sync.push_frame(0.20, 2)
    o1 = sync.pop()
    o2 = sync.pop()
    assert o1 is not None and o2 is not None
    # Intervals must cover (0, 0.1] and (0.1, 0.2] with continuous dts.
    assert abs(np.sum(o1[2]) - 0.10) < 1e-9
    assert abs(np.sum(o2[2]) - 0.10) < 1e-9


def test_restart_detection():
    sync = native.NativeSynchronizer()
    assert not sync.push_frame(0.0, 0)
    assert not sync.push_frame(0.5, 1)
    assert sync.push_frame(2.0, 2)  # gap > 1 s
    assert sync.push_frame(1.5, 3)  # time reversal


def test_tum_writer(tmp_path):
    path = str(tmp_path / "traj.txt")
    w = native.NativeTumWriter(path)
    w.write(1.5, [1, 2, 3], [1, 0, 0, 0])
    w.write(2.5, [4, 5, 6], [0.7071, 0.7071, 0, 0])
    w.close()
    from lfvio_tpu.runtime.trajectory_io import read_tum

    t, p, q = read_tum(path)
    np.testing.assert_allclose(t, [1.5, 2.5])
    np.testing.assert_allclose(p[0], [1, 2, 3])
    np.testing.assert_allclose(q[1], [0.7071, 0.7071, 0, 0])

"""Dataset readers: EuRoC ASL directories and ground-truth CSVs.

Replaces the reference's ROS-bag ingestion + benchmark_publisher GT replay
(benchmark_publisher_node.cpp:33-126) with file readers that feed the same
measurement-stream interface as the synthetic world: ('imu', t, acc, gyr)
and ('frame', t, image_loader) items in time order.
"""

from __future__ import annotations

import csv
import os
from typing import Callable, Iterator

import numpy as np


def read_euroc_imu(path: str):
    """mav0/imu0/data.csv: t[ns], wx, wy, wz, ax, ay, az."""
    out = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            t = float(row[0]) * 1e-9
            gyr = np.array([float(row[1]), float(row[2]), float(row[3])])
            acc = np.array([float(row[4]), float(row[5]), float(row[6])])
            out.append((t, acc, gyr))
    return out


def read_euroc_cam_index(path: str):
    """mav0/cam0/data.csv: t[ns], filename."""
    out = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            out.append((float(row[0]) * 1e-9, row[1].strip()))
    return out


def read_euroc_groundtruth(path: str):
    """state_groundtruth_estimate0/data.csv (or benchmark_publisher's vendored
    copies, reference benchmark_publisher/config/*/data.csv):
    t[ns], p(3), q_wxyz(4), v(3), bw(3), ba(3)."""
    ts, ps, qs = [], [], []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ts.append(float(row[0]) * 1e-9)
            ps.append([float(row[1]), float(row[2]), float(row[3])])
            qs.append([float(row[4]), float(row[5]), float(row[6]), float(row[7])])
    return np.asarray(ts), np.asarray(ps), np.asarray(qs)


def euroc_stream(mav0_dir: str, cam: str = "cam0") -> Iterator:
    """Yield the merged measurement stream for a EuRoC sequence directory.

    Frames carry a lazy loader (grayscale float32 array) so images are only
    decoded when consumed.
    """
    import cv2

    imu = read_euroc_imu(os.path.join(mav0_dir, "imu0", "data.csv"))
    cams = read_euroc_cam_index(os.path.join(mav0_dir, cam, "data.csv"))
    img_dir = os.path.join(mav0_dir, cam, "data")

    def loader(fname: str) -> Callable[[], np.ndarray]:
        def load():
            img = cv2.imread(os.path.join(img_dir, fname), cv2.IMREAD_GRAYSCALE)
            return img.astype(np.float32)

        return load

    stream = [("imu", t, acc, gyr) for (t, acc, gyr) in imu]
    stream += [("frame", t, loader(fn)) for (t, fn) in cams]
    stream.sort(key=lambda e: e[1])
    return iter(stream)


def run_sequence(pipeline, stream, max_frames: int | None = None):
    """Drive a VioPipeline from a dataset stream (frames carry loaders)."""
    n = 0
    for item in stream:
        if item[0] == "imu":
            pipeline.feed_imu(item[1], item[2], item[3])
        else:
            img = item[2]() if callable(item[2]) else item[2]
            pipeline.feed_frame(item[1], img)
            n += 1
            if max_frames and n >= max_frames:
                break
    return pipeline.est

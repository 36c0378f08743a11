"""End-to-end VIO pipeline: frontend + estimator over a measurement stream.

The process-level equivalent of the two ROS nodes + their topic plumbing
(feature_tracker_node.cpp, estimator_node.cpp). Includes the measurement
alignment of getMeasurements (estimator_node.cpp:96-134, 216-258): each frame
is paired with the IMU interval covering it, and the boundary sample is
*linearly interpolated at the frame timestamp* — without this, up to one
IMU period of rotation is misattributed across the frame boundary, which
biases the gyro-bias estimate.
"""

from __future__ import annotations

import numpy as np

from .tracker import FrontEnd
from .estimator import Estimator, EstimatorConfig


class VioPipeline:
    def __init__(self, frontend: FrontEnd, estimator: Estimator, freq: float = 0.0,
                 td: float = 0.0):
        self.fe = frontend
        self.est = estimator
        self.freq = freq  # max publish rate; 0 = publish every frame
        self.td = td  # camera-IMU time offset applied when pairing
        self._last_pub_t = -1e18
        self._last_imu = None  # (t, acc, gyr)
        self._pending = []  # frames waiting for a covering IMU sample

    # ------------------------------------------------------------------ feed
    def feed_imu(self, t, acc, gyr):
        acc = np.asarray(acc, np.float64)
        gyr = np.asarray(gyr, np.float64)
        prev = self._last_imu
        # Flush any pending frame that this sample covers.
        while self._pending and self._pending[0][0] + self.td <= t:
            t_f, img = self._pending.pop(0)
            t_sync = t_f + self.td
            if prev is not None and t_sync > prev[0]:
                # Interpolate the boundary sample at the frame time.
                w = (t_sync - prev[0]) / max(t - prev[0], 1e-12)
                acc_i = (1 - w) * prev[1] + w * acc
                gyr_i = (1 - w) * prev[2] + w * gyr
                self.est.process_imu(t_sync - prev[0], acc_i, gyr_i)
                prev = (t_sync, acc_i, gyr_i)
            self._process_frame(t_f, img)
        dt = 0.0 if prev is None else t - prev[0]
        self.est.process_imu(dt, acc, gyr)
        self._last_imu = (t, acc, gyr)

    def feed_frame(self, t, img):
        self._pending.append((t, img))

    def _process_frame(self, t, img):
        publish = True
        if self.freq > 0 and (t - self._last_pub_t) < 1.0 / self.freq:
            publish = False
        feats = self.fe.process(np.asarray(img), t, publish=publish)
        if publish and feats is not None and len(feats) > 0:
            self._last_pub_t = t
            self.est.process_image(feats, t)

    def run(self, stream, render_fn):
        for item in stream:
            kind, t = item[0], item[1]
            if kind == "imu":
                self.feed_imu(t, item[2], item[3])
            else:
                img = item[2] if item[2] is not None else render_fn(t)
                self.feed_frame(t, img)
        return (
            np.asarray(self.est.times),
            np.asarray(self.est.traj_p),
            np.asarray(self.est.traj_q),
        )

"""End-to-end VIO pipeline: frontend + estimator over a measurement stream.

The process-level equivalent of the two ROS nodes + their topic plumbing
(feature_tracker_node.cpp, estimator_node.cpp): measurements arrive in time
order; IMU samples are forwarded with their dt; frames run the tracker and
feed the estimator. Publishing/threading is replaced by a simple in-process
loop (the C++ io runtime provides the asynchronous version).
"""

from __future__ import annotations

import numpy as np

from .tracker import FrontEnd
from .estimator import Estimator, EstimatorConfig


class VioPipeline:
    def __init__(self, frontend: FrontEnd, estimator: Estimator, freq: float = 0.0):
        self.fe = frontend
        self.est = estimator
        self.last_imu_t = None
        self.freq = freq  # max publish rate; 0 = publish every frame
        self._last_pub_t = -1e18

    def feed_imu(self, t, acc, gyr):
        dt = 0.0 if self.last_imu_t is None else t - self.last_imu_t
        self.last_imu_t = t
        self.est.process_imu(dt, acc, gyr)

    def feed_frame(self, t, img):
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

#!/usr/bin/env python
"""Benchmark: steady-state VIO throughput (frames/s) on the TPU chip.

Workload: full-scale synthetic PAL stream (1280×960, 200 tracked features,
10-keyframe window — the reference rig's configuration, BASELINE.md) driven
through the complete pipeline: CLAHE-off tracker (pyramid + 41×41 KLT +
spherical RANSAC + Shi-Tomasi refill) and the sliding-window BA with
marginalization. Rendering is pre-computed and excluded; everything the
reference's two ROS nodes do per frame is included.

Baseline: the reference is designed to run in real time at its 10 Hz publish
rate on CPU (config freq: 10, solver wall budget 0.04 s — BASELINE.md), so
vs_baseline = fps / 10.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lfvio_tpu.runtime.synthetic import (
        SyntheticWorld,
        make_synthetic_pal_camera,
        fit_inverse_poly,
    )
    from lfvio_tpu.cam import ScaramuzzaCamera
    from lfvio_tpu.runtime.tracker import FrontEnd
    from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
    from lfvio_tpu.runtime.pipeline import VioPipeline

    W, H = 1280, 960
    # Full-scale PAL camera: the mindvision polynomial at native resolution.
    base = np.array([-2.445239e2, 0.0, 1.748610e-3, -1.757770e-6, 4.475965e-9])
    inv_poly = fit_inverse_poly(base, max_rho=510.0)
    cam = ScaramuzzaCamera(
        poly=jnp.asarray(base, jnp.float32),
        inv_poly=jnp.asarray(inv_poly, jnp.float32),
        C=jnp.asarray(1.0, jnp.float32), D=jnp.asarray(0.0, jnp.float32),
        E=jnp.asarray(0.0, jnp.float32),
        cx=jnp.asarray(W / 2.0, jnp.float32), cy=jnp.asarray(H / 2.0, jnp.float32),
    )
    cam64 = ScaramuzzaCamera(
        *[jnp.asarray(np.asarray(x), jnp.float64) for x in
          (base, inv_poly, 1.0, 0.0, 0.0, W / 2.0, H / 2.0)]
    )
    world = SyntheticWorld(camera=cam64, width=W, height=H)

    frame_rate, imu_rate = 15.0, 200.0
    duration = 6.0
    stream = world.generate(duration, frame_rate, imu_rate)

    # Pre-render all frames (dataset IO is not part of the benchmark).
    # uint8, as a real camera driver would hand them over (4x smaller
    # host->device transfer than f32; conversion happens on device).
    frames = {}
    for item in stream:
        if item[0] == "frame":
            img = world.render(item[1])
            peak = max(float(img.max()), 1e-9)
            frames[item[1]] = np.clip(
                img * (255.0 / peak), 0.0, 255.0
            ).astype(np.uint8)

    fe = FrontEnd(
        cam, (H, W), max_cnt=200, min_dist=20, n_slots=256,
        annulus=(W / 2.0, H / 2.0, 500.0 * 0.95, 160.0), equalize=True,
        dtype=jnp.float32,
    )
    est = Estimator(EstimatorConfig(n_feature_slots=256, solver_dtype=jnp.float32))
    pipe = VioPipeline(fe, est)

    # Warmup phase: run ~60% of the stream (compiles everything + initializes).
    t_split = duration * 0.6
    warm = [it for it in stream if it[1] <= t_split]
    rest = [it for it in stream if it[1] > t_split]
    for it in warm:
        if it[0] == "imu":
            pipe.feed_imu(it[1], it[2], it[3])
        else:
            pipe.feed_frame(it[1], frames[it[1]])

    n_frames_timed = sum(1 for it in rest if it[0] == "frame")
    t0 = time.perf_counter()
    for it in rest:
        if it[0] == "imu":
            pipe.feed_imu(it[1], it[2], it[3])
        else:
            pipe.feed_frame(it[1], frames[it[1]])
    elapsed = time.perf_counter() - t0

    fps = n_frames_timed / max(elapsed, 1e-9)
    result = {
        "metric": "vio_frames_per_s_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

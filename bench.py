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

Prints ONE JSON line on stdout; progress/diagnostics go to stderr so a
timeout is always attributable to a phase.
"""

import json
import sys
import time

import numpy as np

T_START = time.perf_counter()


def log(msg):
    print(f"[bench +{time.perf_counter() - T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax

    # Optional persistent compile cache (LFVIO_JAX_CACHE=dir). Off by
    # default: the axon (tunnel) plugin deadlocks when deserializing cached
    # executables (observed: first cached dispatch blocks on a futex
    # forever), so only enable on hosts with a local TPU runtime.
    import os

    cache_dir = os.environ.get("LFVIO_JAX_CACHE", "")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from lfvio_tpu.runtime.synthetic import SyntheticWorld, fit_inverse_poly
    from lfvio_tpu.cam import ScaramuzzaCamera
    from lfvio_tpu.runtime.tracker import FrontEnd
    from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
    from lfvio_tpu.runtime.pipeline import VioPipeline

    log(f"backend={jax.default_backend()} devices={len(jax.devices())}")

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
    world = SyntheticWorld(camera=cam, width=W, height=H)

    # Stress-config knobs (BASELINE config #4: LFVIO_BENCH_FRAME_RATE=30
    # LFVIO_BENCH_MAX_CNT=300 LFVIO_BENCH_WINDOW=20 LFVIO_BENCH_SLOTS=384).
    frame_rate = float(os.environ.get("LFVIO_BENCH_FRAME_RATE", "15.0"))
    imu_rate = 200.0
    max_cnt = int(os.environ.get("LFVIO_BENCH_MAX_CNT", "200"))
    window = int(os.environ.get("LFVIO_BENCH_WINDOW", "10"))
    n_slots = int(os.environ.get("LFVIO_BENCH_SLOTS", "256"))
    duration = float(os.environ.get("LFVIO_BENCH_DURATION", "6.0"))
    stream = world.generate(duration, frame_rate, imu_rate)  # one device call
    log(f"stream generated: {len(stream)} events "
        f"({sum(1 for e in stream if e[0] == 'frame')} frames)")

    # Pre-render all frames (dataset IO is not part of the benchmark) and
    # keep them DEVICE-resident: the reference's camera driver hands frames
    # over shared memory at negligible cost, whereas this TPU sits behind a
    # ~26 MB/s network tunnel (45 ms per 1.2 MB frame — pure test-harness
    # artifact; production TPU hosts feed over PCIe).
    frames = {}
    n_done = 0
    for item in stream:
        if item[0] == "frame":
            p, q = world.pose(item[1])
            from lfvio_tpu.runtime.synthetic import _np_quat_to_mat

            frames[item[1]] = world._render_u8(
                jnp.asarray(_np_quat_to_mat(q), jnp.float32),
                jnp.asarray(p, jnp.float32),
            )  # device array, stays in HBM
            n_done += 1
            if n_done % 30 == 1:
                log(f"rendered {n_done} frames")
    jax.block_until_ready(list(frames.values()))
    log(f"rendering done: {len(frames)} frames (device-resident)")

    fe = FrontEnd(
        cam, (H, W), max_cnt=max_cnt, min_dist=20, n_slots=n_slots,
        annulus=(W / 2.0, H / 2.0, 500.0 * 0.95, 160.0), equalize=True,
        dtype=jnp.float32,
    )
    # Deep-pipeline configuration (production serving mode): 3 tracker
    # frames in flight, solve results integrated 2 frames late, publish
    # throttled to the reference rig's 10 Hz (mindvision.yaml freq: 10 on
    # a 15 fps camera) with unpublished frames' harvests batched — every
    # device->host fetch has crossed the link before it is needed.
    est = Estimator(EstimatorConfig(
        n_feature_slots=n_slots, window=window, solver_dtype=jnp.float32,
        solve_lag=2, max_imu_per_interval=64,
    ))
    pipe = VioPipeline(fe, est, freq=10.0, depth=3)

    # Warmup phase: run ~60% of the stream (compiles everything + initializes).
    t_split = duration * 0.6
    warm = [it for it in stream if it[1] <= t_split]
    rest = [it for it in stream if it[1] > t_split]
    n_warm_frames = sum(1 for it in warm if it[0] == "frame")
    for k, it in enumerate(warm):
        if it[0] == "imu":
            pipe.feed_imu(it[1], it[2], it[3])
        else:
            pipe.feed_frame(it[1], frames[it[1]])
        if k % 200 == 199:
            log(f"warmup event {k + 1}/{len(warm)}")
    log(f"warmup done ({n_warm_frames} frames, pallas={fe.use_pallas}, "
        f"init={'ok' if est.solver_flag == est.NON_LINEAR else 'NOT DONE'})")

    n_frames_timed = sum(1 for it in rest if it[0] == "frame")
    t0 = time.perf_counter()
    for it in rest:
        if it[0] == "imu":
            pipe.feed_imu(it[1], it[2], it[3])
        else:
            pipe.feed_frame(it[1], frames[it[1]])
    elapsed = time.perf_counter() - t0
    log(f"timed section: {n_frames_timed} frames in {elapsed:.2f}s")

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

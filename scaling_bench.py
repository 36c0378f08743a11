#!/usr/bin/env python
"""Scaling measurement for the distributed VIO frame step.

Runs the complete sharded frame step (preint → triangulate → sharded LM BA
→ gauge → TSQR marginalization) on 1/2/4/8-device meshes and reports
steps/s + parallel efficiency. On this environment real multi-chip hardware
is unavailable, so the mesh is the virtual CPU mesh
(--xla_force_host_platform_device_count); the numbers exercise the real
collective program (psum/all_gather) and measure sharding overhead, not ICI
bandwidth. Results are recorded in SCALING.md.

Usage:  python scaling_bench.py [n_features]          # feature-axis rows
        python scaling_bench.py --kf [n_features]     # kf-axis (2-D mesh)
"""

import os
import sys

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the shell presets JAX_PLATFORMS=axon (TPU tunnel) and the env
# var alone does not reliably override the plugin — use the config API too.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import time
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from lfvio_tpu.dist import make_feature_mesh, shard_grid, vio_frame_step_sharded
    from lfvio_tpu.runtime.profiling import make_window_problem

    n_feat = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = jnp.float32
    pb = make_window_problem(
        n_feat, dtype, max_iterations=8,
        estimate_td=True, estimate_extrinsic=True, with_prior=True,
    )
    state, grid, prior, cfg, noise = (
        pb["state"], pb["grid"], pb["prior"], pb["cfg"], pb["noise"])
    dts = jnp.asarray(pb["dts"], dtype)
    accs = jnp.asarray(pb["accs"], dtype)
    gyrs = jnp.asarray(pb["gyrs"], dtype)
    a0 = jnp.asarray(pb["a0"], dtype)
    g0 = jnp.asarray(pb["g0"], dtype)
    imu_valid = jnp.asarray(pb["imu_valid"])

    results = {}
    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    for n_dev in counts:
        mesh = make_feature_mesh(jax.devices()[:n_dev])
        sgrid = shard_grid(grid, mesh)

        def step():
            return vio_frame_step_sharded(
                mesh, state, sgrid, dts, accs, gyrs, a0, g0, imu_valid,
                prior, jnp.zeros((n_feat,), bool), state.p[0], state.q[0],
                noise, cfg, marg_old=True,
            )

        out = step()
        jax.block_until_ready((out[0].p, out[1].J))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = step()
        jax.block_until_ready((out[0].p, out[1].J))
        dt = (time.perf_counter() - t0) / reps
        results[n_dev] = dt
        speedup = results[1] / dt
        print(f"n_dev={n_dev}: {dt*1e3:8.1f} ms/step  speedup={speedup:5.2f}x  "
              f"strong-scaling efficiency={100*speedup/n_dev:5.1f}%",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "sharded_frame_step_ms",
        "n_features": n_feat,
        "per_device_count": {str(k): round(v * 1e3, 1) for k, v in results.items()},
    }))


def main_kf():
    """Keyframe-axis (2-D kf × f mesh) scaling rows: per-ROUND wall time of
    the segmented trajectory solve (S segments × W-kf windows, Fseg
    features each, BP boundary exchange) across mesh shapes."""
    import jax
    import jax.numpy as jnp

    from lfvio_tpu.backend.state import SolverConfig
    from lfvio_tpu.dist import make_kf_mesh, segmented_trajectory_solve
    from lfvio_tpu.dist.synthetic_traj import make_segmented_problem, G_NORM
    from lfvio_tpu.imu import ImuNoise

    n_feat = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    noise = ImuNoise(0.02, 0.01, 0.04, 0.001)
    cfg = SolverConfig(
        max_iterations=6, estimate_td=False, estimate_extrinsic=False
    )
    n_dev = len(jax.devices())
    shapes = [(s, f) for s in (1, 2, 4, 8) for f in (1, 2, 4)
              if s * f <= n_dev and s * f in (1, 2, 4, 8)]
    results = {}
    n_outer = 4
    for S, n_f in shapes:
        Fseg = max(n_feat // max(S, 1) // n_f * n_f, n_f)
        pb = make_segmented_problem(
            S=max(S, 1), Wseg=5, Fseg=Fseg, dtype=jnp.float32, noise=0.0
        )
        mesh = make_kf_mesh(max(S, 1), n_f)

        def step():
            return segmented_trajectory_solve(
                mesh, pb["states"], pb["grids"], pb["dts"], pb["accs"],
                pb["gyrs"], pb["a0"], pb["g0"], pb["imu_valid"],
                pb["priors"], noise, cfg, g_norm=G_NORM, n_outer=n_outer,
            )
        out = step()
        jax.block_until_ready(out[0].p)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = step()
        jax.block_until_ready(out[0].p)
        dt = (time.perf_counter() - t0) / reps / n_outer
        results[f"{S}x{n_f}"] = dt
        print(f"mesh {S}x{n_f} (kf x f), Fseg={Fseg}: "
              f"{dt*1e3:8.1f} ms/round", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "kf_axis_round_ms",
        "segments_x_fshards": {k: round(v * 1e3, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--kf":
        main_kf()
    else:
        main()

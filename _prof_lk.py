"""Microbench: batched-XLA LK vs Pallas LK on the real chip."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from lfvio_tpu.frontend import gaussian_pyramid
from lfvio_tpu.frontend.klt import pyramidal_lk
from lfvio_tpu.frontend.klt_pallas import pyramidal_lk_pallas

def log(m):
    print(m, file=sys.stderr, flush=True)

log(f"backend={jax.default_backend()}")
H, W = 960, 1280
rng = np.random.default_rng(0)
img0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
# smooth it so LK has gradients
k = np.ones(9) / 9.0
img0 = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img0)
img0 = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img0)
dx, dy = 3.3, -2.1
img1 = np.roll(np.roll(img0, 2, axis=0), -3, axis=1)

N = 256
pts = np.stack([rng.uniform(60, W - 60, N), rng.uniform(60, H - 60, N)], 1).astype(np.float32)
valid = np.ones(N, bool)

pyr0 = [jnp.asarray(l) for l in gaussian_pyramid(jnp.asarray(img0), 3)]
pyr1 = [jnp.asarray(l) for l in gaussian_pyramid(jnp.asarray(img1), 3)]
ptsj = jnp.asarray(pts)
vj = jnp.asarray(valid)

fx = jax.jit(lambda a, b, p, v: pyramidal_lk(a, b, p, v, 3))
fp = jax.jit(lambda a, b, p, v: pyramidal_lk_pallas(a, b, p, v, 3))

for name, f in [("xla_batched", fx), ("pallas", fp)]:
    try:
        t0 = time.perf_counter()
        out = f(pyr0, pyr1, ptsj, vj)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        # pipelined average
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = f(pyr0, pyr1, ptsj, vj)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        pn, ok = out
        nok = int(np.asarray(ok).sum())
        err = np.abs(np.asarray(pn) - (pts + np.array([-3.0, 2.0]))).mean()
        log(f"{name}: {dt*1e3:.2f} ms/call (compile {t_compile:.1f}s) ok={nok}/{N} meanerr={err:.3f}px")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

"""Microbench the tracker's device stages on the real chip."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

def log(m):
    print(m, file=sys.stderr, flush=True)

from lfvio_tpu.frontend import (
    clahe, gaussian_pyramid, pyramidal_lk, shi_tomasi_response,
    select_features, annulus_mask, spherical_ransac_e,
)
from lfvio_tpu.cam import ScaramuzzaCamera
from lfvio_tpu.runtime.synthetic import fit_inverse_poly

log(f"backend={jax.default_backend()}")
H, W = 960, 1280
rng = np.random.default_rng(0)
img = rng.uniform(0, 255, (H, W)).astype(np.float32)
imgj = jnp.asarray(img)
N = 256
pts = jnp.asarray(np.stack([rng.uniform(60, W-60, N), rng.uniform(60, H-60, N)], 1), jnp.float32)
valid = jnp.ones(N, bool)
mask = annulus_mask((H, W), W/2, H/2, 475.0, 160.0, dtype=jnp.float32)
b1 = rng.standard_normal((N, 3)); b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
b2 = b1 + 0.01*rng.standard_normal((N, 3)); b2 /= np.linalg.norm(b2, axis=-1, keepdims=True)
b1j, b2j = jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)
key = jax.random.PRNGKey(0)

base = np.array([-2.445239e2, 0.0, 1.748610e-3, -1.757770e-6, 4.475965e-9])
inv_poly = fit_inverse_poly(base, max_rho=510.0)
cam = ScaramuzzaCamera(
    poly=jnp.asarray(base, jnp.float32), inv_poly=jnp.asarray(inv_poly, jnp.float32),
    C=jnp.asarray(1.0, jnp.float32), D=jnp.asarray(0.0, jnp.float32),
    E=jnp.asarray(0.0, jnp.float32),
    cx=jnp.asarray(W/2.0, jnp.float32), cy=jnp.asarray(H/2.0, jnp.float32),
)

f_clahe = jax.jit(clahe)
f_pyr = jax.jit(lambda x: tuple(gaussian_pyramid(x, 3)))
f_resp = jax.jit(shi_tomasi_response)
f_sel = jax.jit(lambda r, p, v: select_features(r, mask > 0, p, v, 200, 20))
f_ransac = jax.jit(lambda k, a, b, v: spherical_ransac_e(k, a, b, v))
f_lift = jax.jit(lambda p: cam.lift_projective(p))

pyr = f_pyr(imgj)
resp = f_resp(pyr[0])

def bench(name, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

bench("clahe", f_clahe, imgj)
bench("pyramid", f_pyr, imgj)
bench("shi_tomasi", f_resp, pyr[0])
bench("select_features", f_sel, resp, pts, valid)
bench("ransac", f_ransac, key, b1j, b2j, valid)
bench("lift", f_lift, pts)
bench("lk", jax.jit(lambda a, b, p, v: pyramidal_lk(list(a), list(b), p, v, 3)), pyr, pyr, pts, valid)

# Fused whole-step as the tracker dispatches it
from lfvio_tpu.runtime.tracker import FrontEnd
fe = FrontEnd(cam, (H, W), max_cnt=200, min_dist=20, n_slots=256,
              annulus=(W/2.0, H/2.0, 475.0, 160.0), equalize=True, dtype=jnp.float32)
imgd = jnp.asarray(img.astype(np.uint8))
pyr1 = fe._pre(imgd)
jax.block_until_ready(pyr1)
def full_step():
    return fe._step(pyr1, pyr1, pts, valid, key, publish=True)
out = full_step(); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10):
    out = full_step()
jax.block_until_ready(out)
log(f"fused _step: {(time.perf_counter()-t0)/10*1e3:.2f} ms")
t0 = time.perf_counter()
for _ in range(10):
    p1 = fe._pre(imgd)
jax.block_until_ready(p1)
log(f"_pre: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

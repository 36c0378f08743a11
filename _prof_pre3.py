"""Bisect the fe._pre slowness within one process."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from lfvio_tpu.frontend import clahe, gaussian_pyramid
from lfvio_tpu.runtime.tracker import FrontEnd
from lfvio_tpu.cam import ScaramuzzaCamera
from lfvio_tpu.runtime.synthetic import fit_inverse_poly

def log(m): print(m, file=sys.stderr, flush=True)
log(f"backend={jax.default_backend()}")
H, W = 960, 1280
rng = np.random.default_rng(0)
img_u8 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
jax.block_until_ready(img_u8)

def bench(name, f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

# 1. plain lambda, same math as _preprocess
bench("lambda clahe+pyr u8", jax.jit(lambda x: tuple(gaussian_pyramid(clahe(x.astype(jnp.float32)), 3))), img_u8)

# 2. FrontEnd instance _pre
base = np.array([-2.445239e2, 0.0, 1.748610e-3, -1.757770e-6, 4.475965e-9])
inv_poly = fit_inverse_poly(base, max_rho=510.0)
cam = ScaramuzzaCamera(
    poly=jnp.asarray(base, jnp.float32), inv_poly=jnp.asarray(inv_poly, jnp.float32),
    C=jnp.asarray(1.0, jnp.float32), D=jnp.asarray(0.0, jnp.float32),
    E=jnp.asarray(0.0, jnp.float32),
    cx=jnp.asarray(W/2.0, jnp.float32), cy=jnp.asarray(H/2.0, jnp.float32),
)
fe = FrontEnd(cam, (H, W), max_cnt=200, min_dist=20, n_slots=256,
              annulus=(W/2.0, H/2.0, 475.0, 160.0), equalize=True, dtype=jnp.float32)
bench("fe._pre", fe._pre, img_u8)
# 3. fresh jit of the bound method
bench("jit(fe._preprocess)", jax.jit(fe._preprocess), img_u8)
# 4. n_levels: fe uses self.n_levels (=3) — same?
log(f"fe.n_levels={fe.n_levels} fe.equalize={fe.equalize} fe.dtype={fe.dtype}")
# 5. clahe then pyramid separately on device
f1 = jax.jit(lambda x: clahe(x.astype(jnp.float32)))
f2 = jax.jit(lambda x: tuple(gaussian_pyramid(x, 3)))
bench("clahe alone", f1, img_u8)
eq = f1(img_u8); jax.block_until_ready(eq)
bench("pyr alone", f2, eq)

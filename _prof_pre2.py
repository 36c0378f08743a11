"""Re-measure fe._pre in isolation vs after _step."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from lfvio_tpu.runtime.tracker import FrontEnd
from lfvio_tpu.cam import ScaramuzzaCamera
from lfvio_tpu.runtime.synthetic import fit_inverse_poly

def log(m): print(m, file=sys.stderr, flush=True)
log(f"backend={jax.default_backend()}")
H, W = 960, 1280
rng = np.random.default_rng(0)
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
img_u8 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
jax.block_until_ready(img_u8)

def bench(name, f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

bench("fe._pre (fresh)", fe._pre, img_u8)
pts = jnp.asarray(np.stack([rng.uniform(60, W-60, 256), rng.uniform(60, H-60, 256)], 1), jnp.float32)
valid = jnp.ones(256, bool)
key = jax.random.PRNGKey(0)
pyr1 = fe._pre(img_u8); jax.block_until_ready(pyr1)
bench("fe._step", lambda: fe._step(pyr1, pyr1, pts, valid, key, publish=True))
bench("fe._pre (after step)", fe._pre, img_u8)
# interleaved like the pipeline: pre then step each "frame"
def frame():
    p = fe._pre(img_u8)
    return fe._step(pyr1, p, pts, valid, key, publish=True)
bench("pre+step interleaved", frame)

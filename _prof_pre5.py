"""Which side effect of FrontEnd.__init__ degrades later dispatches?"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from lfvio_tpu.frontend import clahe, gaussian_pyramid, annulus_mask

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

fA = jax.jit(lambda x: tuple(gaussian_pyramid(clahe(x.astype(jnp.float32)), 3)))
bench("A baseline", fA, img_u8)

mask = annulus_mask((H, W), W/2, H/2, 475.0, 160.0, dtype=jnp.float32)
bench("A after annulus_mask", fA, img_u8)

_ = np.asarray(mask)  # d2h pull of a bool [960,1280]
bench("A after np.asarray(mask)", fA, img_u8)

key = jax.random.PRNGKey(0)
jax.block_until_ready(key)
bench("A after PRNGKey", fA, img_u8)

k2, sub = jax.random.split(key)
bench("A after split", fA, img_u8)

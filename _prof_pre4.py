"""Is the slowness attached to the executable or to global state?"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from lfvio_tpu.frontend import clahe, gaussian_pyramid

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
fB = jax.jit(lambda x: tuple(gaussian_pyramid(clahe(x.astype(jnp.float32)), 3)))  # second identical
bench("A first", fA, img_u8)
bench("B second", fB, img_u8)
bench("A again", fA, img_u8)
# single call timing of A, 1 rep (RTT-dominated?)
bench("A 1rep", fA, img_u8, reps=1)
bench("B 1rep", fB, img_u8, reps=1)
# does a no-op tiny jit also serialize?
fC = jax.jit(lambda x: x + 1)
small = jnp.zeros((8, 128), jnp.float32)
bench("tiny C", fC, small, reps=20)

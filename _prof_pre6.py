"""Characterize the d2h-triggered dispatch degradation."""
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
bench("A baseline", fA, img_u8)

tiny = jnp.arange(8.0)
jax.block_until_ready(tiny)
_ = np.asarray(tiny)  # small d2h of an EAGER array
bench("A after small d2h(eager array)", fA, img_u8)

out = fA(img_u8)
_ = np.asarray(out[1])  # d2h of a JIT OUTPUT
bench("A after d2h(jit output)", fA, img_u8)

# recovery?
import gc; gc.collect()
bench("A after gc", fA, img_u8)
time.sleep(2.0)
bench("A after sleep", fA, img_u8)

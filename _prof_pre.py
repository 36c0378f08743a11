"""Isolate the _pre (CLAHE+pyramid) 55 ms pathology."""
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
img_f = img_u8.astype(jnp.float32)
jax.block_until_ready((img_u8, img_f))

def bench(name, f, *args):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20): out = f(*args)
    jax.block_until_ready(out)
    log(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

bench("cast_only", jax.jit(lambda x: x.astype(jnp.float32)), img_u8)
bench("clahe_f32", jax.jit(clahe), img_f)
bench("clahe_u8cast", jax.jit(lambda x: clahe(x.astype(jnp.float32))), img_u8)
bench("pyr_f32", jax.jit(lambda x: tuple(gaussian_pyramid(x, 3))), img_f)
bench("pyr_u8cast", jax.jit(lambda x: tuple(gaussian_pyramid(x.astype(jnp.float32), 3))), img_u8)
bench("clahe+pyr_f32", jax.jit(lambda x: tuple(gaussian_pyramid(clahe(x), 3))), img_f)
bench("clahe+pyr_u8", jax.jit(lambda x: tuple(gaussian_pyramid(clahe(x.astype(jnp.float32)), 3))), img_u8)

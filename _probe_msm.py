import time, numpy as np, jax, jax.numpy as jnp
t0=time.time()
from zkevm_circuits_tpu.utils.cache import setup_compile_cache
setup_compile_cache()
from zkevm_circuits_tpu.crypto import curve as cv
from zkevm_circuits_tpu.poly.msm import msm
print("imports", time.time()-t0, "backend", jax.default_backend(), flush=True)
for n_log, lanes in ((10, 4), (14, 8)):
    n = 1 << n_log
    rng = np.random.default_rng(99)
    t0=time.time()
    pts = cv.g1_generator((n,))
    sc = np.frombuffer(rng.bytes(n*32), np.uint8).reshape(n,32).copy()
    sc[:,31] &= 0x0F
    sc = jax.device_put(jnp.asarray(sc))
    out = msm(pts, sc, lanes=lanes)
    np.asarray(out.x)
    print(f"n=2^{n_log} lanes={lanes} compile+first: {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(3):
        out = msm(pts, sc, lanes=lanes)
    np.asarray(out.x)
    dt=(time.time()-t0)/3
    print(f"n=2^{n_log} steady: {dt:.3f}s = {n/dt/1e6:.4f} Mpoints/s", flush=True)

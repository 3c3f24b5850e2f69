"""Isolate attention variant costs at the v1 mid-block shape."""
import time
import jax, jax.numpy as jnp
from cvvae_tpu.ops import attention
from cvvae_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

def timed(fn, *args, iters=5):
    out = fn(*args); float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best

for s in (5184, 8100):
    q = jax.random.normal(jax.random.PRNGKey(0), (5, s, 512), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (5, s, 512), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (5, s, 512), jnp.bfloat16)
    sc = 512 ** -0.5
    t = timed(jax.jit(lambda q,k,v: attention._attention_block(q,k,v,sc)), q,k,v)
    print(f"S={s} full exact : {t*1e3:7.1f} ms")
    for qc in (512, 1024, 2048):
        t = timed(jax.jit(lambda q,k,v,qc=qc: attention._me_attention(q,k,v,sc,qc)), q,k,v)
        print(f"S={s} me q={qc:5d}: {t*1e3:7.1f} ms")
    t = timed(jax.jit(lambda q,k,v: attention._flash_attention(q,k,v,sc)), q,k,v)
    print(f"S={s} flash     : {t*1e3:7.1f} ms")

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transformer_recommenders_tpu.ops.fused_infonce import fused_infonce_loss
from transformer_recommenders_tpu.ops.gather_matmul import gather_rows

r = np.random.default_rng(0)
R, D = 8192, 128
q = jnp.asarray(r.normal(size=(R, D)), jnp.float32)
p = jnp.asarray(r.normal(size=(R, D)), jnp.float32)
n = jnp.asarray(r.normal(size=(R, D)), jnp.float32)
rv = jnp.asarray(np.ones(R, bool))
nv = jnp.asarray(np.ones(R, bool))

def timed(name, fn, reps=30):
    out = fn(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)

for tr, tc in [(512, 2048), (256, 4096), (512, 4096), (1024, 2048), (256, 8192), (512, 8192)]:
    try:
        fn = jax.jit(lambda tr=tr, tc=tc: fused_infonce_loss(q, p, n, rv, nv, tile_rows=tr, tile_cols=tc))
        timed(f"infonce fwd tr={tr} tc={tc}", fn)
    except Exception as e:
        print(f"infonce tr={tr} tc={tc} FAILED: {type(e).__name__}", flush=True)

N_TBL = 4097
table = jnp.asarray(r.normal(size=(N_TBL, D)), jnp.float32)
idx = jnp.asarray(r.integers(0, N_TBL, size=3*R), jnp.int32)
for trr, tn in [(512, 2048), (1024, 4096), (2048, 4096), (512, 4096), (4096, 4096)]:
    try:
        fn = jax.jit(lambda trr=trr, tn=tn: gather_rows(table, idx, trr, tn).sum())
        timed(f"gather tr={trr} tn={tn}", fn)
    except Exception as e:
        print(f"gather tr={trr} tn={tn} FAILED: {type(e).__name__}", flush=True)

tk = jax.jit(lambda: jnp.take(table, idx, axis=0).sum())
timed("jnp.take 24576 rows", tk)

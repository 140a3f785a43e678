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
rv = jnp.asarray(np.ones(R, bool)); nv = jnp.asarray(np.ones(R, bool))

def timed(name, fn, reps=40):
    out = fn(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)

# loss fwd+bwd at current defaults
g = jax.jit(jax.grad(lambda q, p, n: fused_infonce_loss(q, p, n, rv, nv), argnums=(0,1,2)))
timed("loss fwd+bwd (defaults)", lambda: g(q, p, n))

# gather fwd tiles
N_TBL = 4097
table = jnp.asarray(r.normal(size=(N_TBL, D)), jnp.float32)
idx = jnp.asarray(r.integers(0, N_TBL, size=3*R), jnp.int32)
for trr, tn in [(1024, 4096), (2048, 2048), (8192, 4096)]:
    fn = jax.jit(lambda trr=trr, tn=tn: gather_rows(table, idx, trr, tn).sum())
    try:
        timed(f"gather fwd tr={trr} tn={tn}", fn)
    except Exception as e:
        print(f"gather tr={trr} tn={tn} FAILED {type(e).__name__}", flush=True)

# gather bwd (dtable) at tile combos
for trr, tn in [(512, 2048), (2048, 2048), (4096, 1024)]:
    gb = jax.jit(jax.grad(lambda t, trr=trr, tn=tn: (gather_rows(t, idx, trr, tn)**2).sum()))
    try:
        timed(f"gather fwd+bwd tr={trr} tn={tn}", lambda: gb(table))
    except Exception as e:
        print(f"gather bwd tr={trr} tn={tn} FAILED {type(e).__name__}", flush=True)

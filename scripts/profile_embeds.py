import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transformer_recommenders_tpu.models.recommender import compute_embeds, fast_table_lookup
from transformer_recommenders_tpu.models.transformer import init_transformer_params
from __graft_entry__ import _flagship_config

B,S,N,EMB = 256,32,4096,384
cfg = _flagship_config()
params = init_transformer_params(jax.random.key(0), cfg)
r = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([np.zeros((1,EMB),np.float32), r.normal(size=(N,EMB)).astype(np.float32)]))
batch = {k: jnp.asarray(r.integers(1,N+1,size=(B,S)).astype(np.int32)) for k in ["history_item_idx","pos_item_idx","neg_item_idx"]}
key = jax.random.key(0)

def timed(name, fn, *args, reps=30):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)

ce = jax.jit(lambda p: compute_embeds(p, cfg, table, batch["history_item_idx"], batch["pos_item_idx"], batch["neg_item_idx"], dropout_rng=key)["query"])
timed("compute_embeds fwd", ce, params)

tk = jax.jit(lambda: jnp.take(table, batch["pos_item_idx"].reshape(-1), axis=0).sum())
timed("jnp.take 8192 rows x 384", tk)

oh = jax.jit(lambda: fast_table_lookup(table, batch["pos_item_idx"].reshape(-1), compute_dtype="bfloat16").sum())
timed("onehot lookup 8192 rows x 384", oh)

# full fused loss gradient wrt params but with remat of compute_embeds
from transformer_recommenders_tpu.ops.fused_infonce import fused_infonce_loss
def full_loss(p):
    e = compute_embeds(p, cfg, table, batch["history_item_idx"], batch["pos_item_idx"], batch["neg_item_idx"], dropout_rng=key)
    return fused_infonce_loss(e["query"], e["pos_embed"], e["neg_pool"], e["row_valid"], e["neg_valid"])
timed("full loss fwd (again)", jax.jit(full_loss), params)
remat_loss = jax.checkpoint(full_loss)
timed("full loss fwd+bwd remat", jax.jit(jax.grad(remat_loss)), params)

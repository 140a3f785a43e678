import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transformer_recommenders_tpu.models.recommender import compute_embeds
from transformer_recommenders_tpu.models.transformer import init_transformer_params, transformer_encode
from transformer_recommenders_tpu.ops.fused_infonce import fused_infonce_loss
from transformer_recommenders_tpu.training.train_state import make_optimizer, init_train_state
from __graft_entry__ import _flagship_config

B,S,N,EMB = 256,32,4096,384
cfg = _flagship_config()
params = init_transformer_params(jax.random.key(0), cfg)
r = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([np.zeros((1,EMB),np.float32), r.normal(size=(N,EMB)).astype(np.float32)]))
batch = {k: jnp.asarray(r.integers(1,N+1,size=(B,S)).astype(np.int32)) for k in ["history_item_idx","pos_item_idx","neg_item_idx"]}
key = jax.random.key(0)

def timed(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)

x = jnp.take(table, batch["history_item_idx"], axis=0)

# encoder forward only (no dropout)
enc_fwd = jax.jit(lambda p, x: transformer_encode(p, cfg, x)["token_embeddings"])
timed("encoder fwd (no dropout)", enc_fwd, params, x)

# encoder fwd with dropout
enc_fwd_do = jax.jit(lambda p, x, k: transformer_encode(p, cfg, x, dropout_rng=k)["token_embeddings"])
timed("encoder fwd (dropout)", enc_fwd_do, params, x, key)

# encoder fwd+bwd
enc_grad = jax.jit(jax.grad(lambda p, x, k: transformer_encode(p, cfg, x, dropout_rng=k)["token_embeddings"].sum()))
timed("encoder fwd+bwd (dropout)", enc_grad, params, x, key)

# compute_embeds fwd+bwd + fused loss
def full_loss(p):
    e = compute_embeds(p, cfg, table, batch["history_item_idx"], batch["pos_item_idx"], batch["neg_item_idx"], dropout_rng=key)
    return fused_infonce_loss(e["query"], e["pos_embed"], e["neg_pool"], e["row_valid"], e["neg_valid"])
timed("full loss fwd", jax.jit(full_loss), params)
timed("full loss fwd+bwd", jax.jit(jax.grad(full_loss)), params)

# + optimizer
opt = make_optimizer(cfg)
state = init_train_state(cfg, params)
def step(state):
    g = jax.grad(full_loss)(state.params)
    u, os_ = opt.update(g, state.opt_state, state.params)
    return state._replace(params=optax.apply_updates(state.params, u), opt_state=os_, step=state.step+1)
sj = jax.jit(step)
st = sj(state); jax.block_until_ready(st.params)
t0=time.time()
for _ in range(20): st = sj(st)
jax.block_until_ready(st.params)
print(f"full step (fused): {(time.time()-t0)/20*1000:.2f} ms -> {256/((time.time()-t0)/20):.0f} ex/s", flush=True)

# isolated kernel fwd
e = jax.jit(lambda p: compute_embeds(p, cfg, table, batch["history_item_idx"], batch["pos_item_idx"], batch["neg_item_idx"]))(params)
jax.block_until_ready(e["query"])
kf = jax.jit(lambda q,pp,nn: fused_infonce_loss(q, pp, nn, e["row_valid"], e["neg_valid"]))
timed("kernel fwd isolated", kf, e["query"], e["pos_embed"], e["neg_pool"])
kg = jax.jit(jax.grad(lambda q: fused_infonce_loss(q, e["pos_embed"], e["neg_pool"], e["row_valid"], e["neg_valid"])))
timed("kernel fwd+bwd isolated", kg, e["query"])


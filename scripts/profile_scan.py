import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transformer_recommenders_tpu.training.train_state import init_train_state, make_train_step
from transformer_recommenders_tpu.training.scan_steps import make_scanned_train_steps
from __graft_entry__ import _flagship_config
from transformer_recommenders_tpu.models.transformer import init_transformer_params

B,S,N,EMB = 256,32,4096,384
cfg = _flagship_config()
params = init_transformer_params(jax.random.key(0), cfg)
r = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([np.zeros((1,EMB),np.float32), r.normal(size=(N,EMB)).astype(np.float32)]))
state = init_train_state(cfg, params)
mk = lambda s: {k: jnp.asarray(r.integers(1,N+1,size=(B,S)).astype(np.int32)) for k in ["history_item_idx","pos_item_idx","neg_item_idx"]}
batches=[mk(i) for i in range(8)]
step = make_train_step(cfg)
key = jax.random.key(0)
t0=time.time()
for i in range(3): state, logs = step(state, table, batches[i%8], key)
jax.block_until_ready(state.params)
print(f"single-step compile+warm: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
for i in range(30): state, logs = step(state, table, batches[i%8], key)
jax.block_until_ready(state.params)
per_disp = (time.time()-t0)/30
print(f"single-step dispatch: {per_disp*1000:.2f} ms/step -> {B/per_disp:.0f} ex/s", flush=True)

K=8
scan = make_scanned_train_steps(cfg)
stacked = {k: jnp.asarray(np.stack([np.asarray(batches[i%8][k]) for i in range(K)])) for k in batches[0]}
state2 = init_train_state(cfg, params)
t0=time.time()
state2, logs = scan(state2, table, stacked, key)
jax.block_until_ready(state2.params)
print(f"scan compile+first: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
reps=6
for i in range(reps): state2, logs = scan(state2, table, stacked, key)
jax.block_until_ready(state2.params)
per_step = (time.time()-t0)/(reps*K)
print(f"scanned ({K}/dispatch): {per_step*1000:.2f} ms/step -> {B/per_step:.0f} ex/s", flush=True)

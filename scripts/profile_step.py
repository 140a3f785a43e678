import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transformer_recommenders_tpu.training.train_state import init_train_state
from transformer_recommenders_tpu.training.scan_steps import make_scanned_train_steps
from __graft_entry__ import _flagship_config
from transformer_recommenders_tpu.models.transformer import init_transformer_params

S,N,EMB = 32,4096,384
for B in [64, 128, 256]:
    cfg = _flagship_config()
    params = init_transformer_params(jax.random.key(0), cfg)
    r = np.random.default_rng(0)
    table = jnp.asarray(np.concatenate([np.zeros((1,EMB),np.float32), r.normal(size=(N,EMB)).astype(np.float32)]))
    K=8
    stacked = {k: jnp.asarray(r.integers(1,N+1,size=(K,B,S)).astype(np.int32)) for k in ["history_item_idx","pos_item_idx","neg_item_idx"]}
    state = init_train_state(cfg, params)
    scan = make_scanned_train_steps(cfg)
    key = jax.random.key(0)
    t0=time.time()
    state, logs = scan(state, table, stacked, key)
    jax.block_until_ready(state.params)
    print(f"B={B} compile+first: {time.time()-t0:.1f}s", flush=True)
    t0=time.time(); reps=6
    for i in range(reps): state, logs = scan(state, table, stacked, key)
    jax.block_until_ready(state.params)
    per_step=(time.time()-t0)/(reps*K)
    print(f"B={B}: {per_step*1000:.2f} ms/step -> {B/per_step:.0f} ex/s", flush=True)

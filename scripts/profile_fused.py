import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transformer_recommenders_tpu.configs import LossConfig
from transformer_recommenders_tpu.ops import losses as L
from transformer_recommenders_tpu.ops.fused_infonce import fused_infonce_loss
from transformer_recommenders_tpu.training.train_state import init_train_state, make_train_step
from transformer_recommenders_tpu.training.scan_steps import make_scanned_train_steps
from __graft_entry__ import _flagship_config
from transformer_recommenders_tpu.models.transformer import init_transformer_params

# 1) numerical check of the compiled kernel on TPU
r = np.random.default_rng(0)
R, D = 1024, 128
q = jnp.asarray(r.normal(size=(R, D)), jnp.float32)
p = jnp.asarray(r.normal(size=(R, D)), jnp.float32)
n = jnp.asarray(r.normal(size=(R, D)), jnp.float32)
rv = jnp.asarray(r.random(R) > 0.2)
nv = jnp.asarray(r.random(R) > 0.2)
cfg_l = LossConfig()
ref = float(L.compute_losses(cfg_l, q, p, n, rv, nv, loss_names=("InfoNCELoss",))["InfoNCELoss"])
fused = float(fused_infonce_loss(q, p, n, rv, nv))
print(f"TPU value check: ref={ref:.4f} fused={fused:.4f} relerr={abs(ref-fused)/abs(ref):.2e}", flush=True)
g_ref = jax.grad(lambda q: L.compute_losses(cfg_l, q, p, n, rv, nv, loss_names=("InfoNCELoss",))["InfoNCELoss"])(q)
g_fused = jax.grad(lambda q: fused_infonce_loss(q, p, n, rv, nv))(q)
rel = float(jnp.linalg.norm(g_ref - g_fused) / jnp.linalg.norm(g_ref))
print(f"TPU grad check: relerr={rel:.2e}", flush=True)

# 2) train-step timing with/without fused loss
B,S,N,EMB = 256,32,4096,384
base = _flagship_config()
r2 = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([np.zeros((1,EMB),np.float32), r2.normal(size=(N,EMB)).astype(np.float32)]))
mkb = lambda: {k: jnp.asarray(r2.integers(1,N+1,size=(B,S)).astype(np.int32)) for k in ["history_item_idx","pos_item_idx","neg_item_idx"]}
batches=[mkb() for _ in range(8)]
key = jax.random.key(0)

for fused_on in [False, True]:
    cfg = base.model_copy(update={"use_fused_loss": fused_on})
    params = init_transformer_params(jax.random.key(0), cfg)
    K=8
    scan = make_scanned_train_steps(cfg)
    stacked = {k: jnp.asarray(np.stack([np.asarray(batches[i%8][k]) for i in range(K)])) for k in batches[0]}
    state = init_train_state(cfg, params)
    t0=time.time()
    state, logs = scan(state, table, stacked, key)
    jax.block_until_ready(state.params)
    print(f"fused={fused_on} compile+first: {time.time()-t0:.1f}s loss0={float(logs['loss/InfoNCELoss'][0]):.2f}", flush=True)
    t0=time.time(); reps=6
    for i in range(reps): state, logs = scan(state, table, stacked, key)
    jax.block_until_ready(state.params)
    per_step=(time.time()-t0)/(reps*K)
    print(f"fused={fused_on}: {per_step*1000:.2f} ms/step -> {B/per_step:.0f} ex/s", flush=True)

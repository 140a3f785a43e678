"""Top individual ops by device self-time for the current scanned step."""
import collections, glob, pathlib, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from __graft_entry__ import _flagship_config
from transformer_recommenders_tpu.models.transformer import init_transformer_params
from transformer_recommenders_tpu.training.scan_steps import make_scanned_train_steps
from transformer_recommenders_tpu.training.train_state import init_train_state

B, S, N, EMB, K = 256, 32, 4096, 384, 16
cfg = _flagship_config()
params = init_transformer_params(jax.random.key(0), cfg)
r = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([np.zeros((1, EMB), np.float32),
                    r.normal(size=(N, EMB)).astype(np.float32)]))
stacked = {k: jnp.asarray(r.integers(1, N + 1, size=(K, B, S)).astype(np.int32))
           for k in ["history_item_idx", "pos_item_idx", "neg_item_idx"]}
state = init_train_state(cfg, params)
scan = make_scanned_train_steps(cfg)
keys = [jax.random.key(i) for i in range(8)]
state, logs = scan(state, table, stacked, keys[0])
jax.block_until_ready((state, logs))
jax.profiler.start_trace("/tmp/xtrace_ops")
for i in range(4):
    state, logs = scan(state, table, stacked, keys[1 + i])
jax.block_until_ready((state, logs))
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2
paths = sorted(glob.glob("/tmp/xtrace_ops/**/*.xplane.pb", recursive=True))
xspace = xplane_pb2.XSpace()
xspace.ParseFromString(open(paths[-1], "rb").read())
per_op = collections.Counter()
steps = 4 * K
for plane in xspace.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    # axon's device plane carries one line per traced dispatch (named
    # "0".."3") with nested events: module wrapper > while > HLO ops.
    # Aggregate every event and drop the wrapper levels from the table.
    total_ps = 0
    for line in plane.lines:
        for event in line.events:
            meta = plane.event_metadata[event.metadata_id]
            name = meta.name
            if name.startswith("jit_"):
                total_ps += event.duration_ps
                continue
            if name.isdigit() or name.startswith("%while"):
                continue
            per_op[name] += event.duration_ps
print(f"device total: {total_ps/1e9/steps:.4f} ms/step")
print("top 30 ops by device time:")
shown = 0
for name, ps in per_op.most_common(30):
    print(f"  {ps/1e9/steps:8.4f} ms/step  {name[:110]}")
    shown += ps
print(f"  (top-30 sum {shown/1e9/steps:.4f} ms/step)")

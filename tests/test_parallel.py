"""Distributed-invariance tests on the virtual 8-device CPU mesh.

SURVEY.md §4: the reference tests nothing distributed; these verify the
TPU design's core guarantees — sharded lookup/top-k/train-step produce the
SAME numbers as their single-device counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from transformer_recommenders_tpu.configs import MeshConfig, TrainConfig
from transformer_recommenders_tpu.models.transformer import init_transformer_params
from transformer_recommenders_tpu.ops.topk import topk_items
from transformer_recommenders_tpu.parallel import embedding as pemb
from transformer_recommenders_tpu.parallel import mesh as pmesh
from transformer_recommenders_tpu.parallel.topk_sharded import sharded_topk
from transformer_recommenders_tpu.parallel.train import (
    make_sharded_train_step,
    place_state,
)
from transformer_recommenders_tpu.training.train_state import (
    init_train_state,
    make_train_step,
)

RNG = np.random.default_rng(0)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def mesh2x4():
    return pmesh.create_mesh(MeshConfig(data_axis_size=2, model_axis_size=4))


@pytest.fixture(scope="module")
def mesh8x1():
    return pmesh.create_mesh(MeshConfig(data_axis_size=8, model_axis_size=1))


# ---------------------------------------------------------------------------
# row-sharded embedding lookup
# ---------------------------------------------------------------------------


def test_sharded_lookup_matches_dense(mesh2x4):
    table = RNG.normal(size=(103, 16)).astype(np.float32)  # non-divisible rows
    idx = RNG.integers(0, 103, size=(4, 7)).astype(np.int32)
    placed = pemb.place_table(table, mesh2x4)
    out = pemb.sharded_table_lookup(placed, jnp.asarray(idx), mesh2x4)
    np.testing.assert_allclose(np.asarray(out), table[idx], rtol=1e-6)


def test_sharded_lookup_duplicate_and_pad_indices(mesh2x4):
    table = RNG.normal(size=(64, 8)).astype(np.float32)
    idx = np.asarray([[0, 0, 5, 5, 63, 63, 0]], np.int32)  # dupes + repeated pads
    placed = pemb.place_table(table, mesh2x4)
    out = pemb.sharded_table_lookup(placed, jnp.asarray(idx), mesh2x4)
    np.testing.assert_allclose(np.asarray(out), table[idx], rtol=1e-6)


def test_sharded_lookup_out_of_range_gives_zero(mesh2x4):
    table = RNG.normal(size=(64, 8)).astype(np.float32)
    placed = pemb.place_table(table, mesh2x4)
    out = pemb.sharded_table_lookup(
        placed, jnp.asarray([[200]], jnp.int32), mesh2x4
    )
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_sharded_lookup_under_jit_with_batch_sharding(mesh2x4):
    table = RNG.normal(size=(64, 8)).astype(np.float32)
    placed = pemb.place_table(table, mesh2x4)
    idx = RNG.integers(0, 64, size=(8, 5)).astype(np.int32)
    idx_dev = jax.device_put(jnp.asarray(idx), pmesh.batch_sharding(mesh2x4))

    @jax.jit
    def f(t, i):
        return pemb.sharded_table_lookup(t, i, mesh2x4, idx_spec=P("data"))

    np.testing.assert_allclose(np.asarray(f(placed, idx_dev)), table[idx], rtol=1e-6)


# ---------------------------------------------------------------------------
# column-sharded top-k
# ---------------------------------------------------------------------------


def test_sharded_topk_matches_single_device(mesh2x4):
    items = RNG.normal(size=(96, 16)).astype(np.float32)
    queries = RNG.normal(size=(5, 16)).astype(np.float32)
    exclude = np.asarray(
        [[1, 2, 0], [0, 0, 0], [90, 4, 5], [96, 1, 0], [33, 0, 0]], np.int32
    )
    ref_scores, ref_idx = topk_items(
        jnp.asarray(queries), jnp.asarray(items), 10, exclude_idx=jnp.asarray(exclude)
    )
    placed = pemb.place_table(items, mesh2x4)
    s, i = sharded_topk(
        jnp.asarray(queries),
        placed,
        10,
        mesh2x4,
        exclude_idx=jnp.asarray(exclude),
        num_items=96,
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_scores), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_idx))


def test_sharded_topk_with_row_padding(mesh2x4):
    # 50 items pad to 52 (4 shards x 13); pad rows must never be returned
    items = -np.abs(RNG.normal(size=(50, 8))).astype(np.float32)  # all scores < 0
    queries = np.abs(RNG.normal(size=(3, 8))).astype(np.float32)
    placed = pemb.place_table(items, mesh2x4)
    s, i = sharded_topk(queries, placed, 20, mesh2x4, metric="dot", num_items=50)
    assert (np.asarray(i) <= 50).all()
    ref_s, ref_i = topk_items(
        jnp.asarray(queries), jnp.asarray(items), 20, metric="dot"
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_sharded_topk_k_larger_than_shard(mesh2x4):
    items = RNG.normal(size=(32, 8)).astype(np.float32)  # 8 rows/shard < k=12
    queries = RNG.normal(size=(2, 8)).astype(np.float32)
    placed = pemb.place_table(items, mesh2x4)
    s, i = sharded_topk(queries, placed, 12, mesh2x4, num_items=32)
    ref_s, ref_i = topk_items(jnp.asarray(queries), jnp.asarray(items), 12)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


# ---------------------------------------------------------------------------
# sharded train step == single-device train step
# ---------------------------------------------------------------------------


def _make_setup(seed=0, n_items=40, b=8, s=4, d=16):
    cfg = TrainConfig(
        hidden_size=d,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=s,
        compute_dtype="float32",
        hidden_dropout=0.0,  # dropout keys differ by dp-rank; disable for equality
        attention_dropout=0.0,
        train_loss="InfoNCELoss",
        learning_rate=1e-3,
    )
    params = init_transformer_params(jax.random.key(seed), cfg)
    table = RNG.normal(size=(n_items + 1, d)).astype(np.float32)
    table[0] = 0
    batch = {
        "history_item_idx": RNG.integers(1, n_items + 1, size=(b, s)).astype(np.int32),
        "pos_item_idx": RNG.integers(0, n_items + 1, size=(b, s)).astype(np.int32),
        "neg_item_idx": RNG.integers(1, n_items + 1, size=(b, s)).astype(np.int32),
    }
    # a couple of padded rows
    batch["history_item_idx"][-1] = 0
    return cfg, params, table, batch


@pytest.mark.parametrize("mesh_name", ["mesh2x4", "mesh8x1"])
def test_sharded_train_step_matches_single_device(mesh_name, request):
    mesh = request.getfixturevalue(mesh_name)
    cfg, params, table, batch = _make_setup()

    # single-device reference
    ref_step = make_train_step(cfg)
    state0 = init_train_state(cfg, params)
    rng = jax.random.key(7)
    ref_state, ref_logs = ref_step(state0, jnp.asarray(table), batch, rng)

    # sharded
    placed_table = pemb.place_table(table, mesh)
    sh_state = place_state(init_train_state(cfg, params), mesh)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    sh_step = make_sharded_train_step(cfg, mesh)
    sh_state, sh_logs = sh_step(sh_state, placed_table, sh_batch, rng)

    for key in ["loss/InfoNCELoss", "loss/PairwiseLogisticLoss", "loss/NCELoss"]:
        np.testing.assert_allclose(
            float(sh_logs[key]), float(ref_logs[key]), rtol=1e-4, atol=1e-4
        )
    # parameters after one update match
    for a, b_ in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_sharded_train_step_multiple_steps(mesh2x4):
    cfg, params, table, batch = _make_setup()
    placed_table = pemb.place_table(table, mesh2x4)
    state = place_state(init_train_state(cfg, params), mesh2x4)
    cfg = cfg.model_copy(update={"learning_rate": 1e-2})
    step = make_sharded_train_step(cfg, mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)
    losses = []
    for i in range(30):
        state, logs = step(state, placed_table, sh_batch, jax.random.key(i))
        losses.append(float(logs["loss/InfoNCELoss"]))
    assert losses[-1] < losses[0] * 0.8  # optimizing the same batch must descend
    assert int(state.step) == 30


def test_sharded_train_step_with_projection(mesh2x4):
    """Sharded pre-projected-shard path == single-device pre-projected path
    when input_dim != hidden_size."""
    cfg, params, table, batch = _make_setup(d=16)
    cfg = cfg.model_copy(update={"input_dim": 24, "hidden_size": 16})
    params = init_transformer_params(jax.random.key(0), cfg)
    table = RNG.normal(size=(41, 24)).astype(np.float32)
    table[0] = 0

    ref_step = make_train_step(cfg)
    state0 = init_train_state(cfg, params)
    rng = jax.random.key(7)
    ref_state, ref_logs = ref_step(state0, jnp.asarray(table), batch, rng)

    placed_table = pemb.place_table(table, mesh2x4)
    sh_state = place_state(init_train_state(cfg, params), mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)
    sh_step = make_sharded_train_step(cfg, mesh2x4)
    sh_state, sh_logs = sh_step(sh_state, placed_table, sh_batch, rng)

    np.testing.assert_allclose(
        float(sh_logs["loss/InfoNCELoss"]),
        float(ref_logs["loss/InfoNCELoss"]),
        rtol=1e-4,
    )
    for a, b_ in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_sharded_eval_matches_single_device(mesh2x4):
    """ShardedEvaluator (collective lookup + column-sharded top-k) produces
    the same aggregate metrics as the single-device Evaluator."""
    from transformer_recommenders_tpu.data.module import EvalArrays
    from transformer_recommenders_tpu.training.evaluator import (
        Evaluator,
        ShardedEvaluator,
    )

    cfg, params, table, _ = _make_setup(n_items=60, d=16)
    cfg = cfg.model_copy(update={"top_k": 8, "eval_batch_size": 8})
    u, s = 13, cfg.max_seq_length
    hw = RNG.integers(1, 61, size=(u, s)).astype(np.int32)
    hists = [RNG.integers(1, 61, size=RNG.integers(1, 9)).astype(np.int32) for _ in range(u)]
    tlists = [
        np.unique(RNG.integers(1, 61, size=RNG.integers(0, 6)).astype(np.int32))
        for _ in range(u)
    ]
    arrays = EvalArrays(
        user_ids=[f"u{i}" for i in range(u)],
        histories=hists,
        history_window=hw,
        target_lists=tlists,
        n_targets=np.asarray([len(t) for t in tlists], np.int32),
    )

    single = Evaluator(cfg).run(params, jnp.asarray(table), arrays)

    placed_full = pemb.place_table(table, mesh2x4)
    placed_items = pemb.place_table(table[1:], mesh2x4)
    sharded = ShardedEvaluator(cfg, mesh2x4, num_items=60).run(
        params, (placed_full, placed_items), arrays
    )
    assert set(single) == set(sharded)
    for key in single:
        np.testing.assert_allclose(sharded[key], single[key], rtol=1e-5, atol=1e-6)


def test_full_trainer_on_2d_mesh(tmp_path):
    """End-to-end fit/eval through the Trainer on a (4, 2) mesh: DP batch
    sharding + row-sharded table + sharded eval, via the public config
    surface (model_axis_size=2)."""
    from transformer_recommenders_tpu.configs import SeqDataModuleConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=24,
        max_seq_length=8,
        batch_size=16,
        synthetic_num_users=40,
        synthetic_num_items=60,
        synthetic_num_events=3000,
    )
    config = TrainConfig(
        input_dim=24,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=8,
        compute_dtype="float32",
        max_epochs=1,
        eval_batch_size=16,
        top_k=5,
        log_every_n_steps=1000,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    config = config.model_copy(
        update={"mesh": MeshConfig(data_axis_size=4, model_axis_size=2)}
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "logs"))
    result = trainer.fit()
    assert trainer.mesh.shape == {"data": 4, "model": 2}
    assert np.isfinite(result["val/retrieval_normalized_dcg"])


# ---------------------------------------------------------------------------
# round 2: sharded-mode feature parity (VERDICT.md next #6)
# ---------------------------------------------------------------------------


def test_sharded_full_logs_match_single_device(mesh2x4):
    """Logit statistics + batch stats in sharded logs equal the single-chip
    values (moments psum/min/max-reduced across the data axis)."""
    cfg, params, table, batch = _make_setup()
    ref_step = make_train_step(cfg)
    rng = jax.random.key(7)
    _, ref_logs = ref_step(init_train_state(cfg, params), jnp.asarray(table), batch, rng)

    placed_table = pemb.place_table(table, mesh2x4)
    sh_state = place_state(init_train_state(cfg, params), mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)
    _, sh_logs = make_sharded_train_step(cfg, mesh2x4)(
        sh_state, placed_table, sh_batch, rng
    )

    stat_keys = [k for k in ref_logs if k.startswith(("logits/", "batch/"))]
    assert stat_keys, "single-device logs must carry statistics"
    for key in stat_keys:
        assert key in sh_logs, f"sharded logs missing {key}"
        np.testing.assert_allclose(
            float(sh_logs[key]), float(ref_logs[key]), rtol=1e-4, atol=1e-5,
            err_msg=key,
        )


def test_sharded_fast_step_matches_full_objective(mesh2x4):
    from transformer_recommenders_tpu.parallel.train import make_sharded_loss

    cfg, params, table, batch = _make_setup()
    placed_table = pemb.place_table(table, mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)
    rng = jax.random.key(5)
    full = make_sharded_loss(cfg, mesh2x4, full_logs=True)
    fast = make_sharded_loss(cfg, mesh2x4, full_logs=False)
    loss_full, _ = jax.jit(full)(params, placed_table, sh_batch, rng)
    loss_fast, fast_logs = jax.jit(fast)(params, placed_table, sh_batch, rng)
    np.testing.assert_allclose(float(loss_fast), float(loss_full), rtol=1e-5)
    assert "batch/positive_non_zero" in fast_logs


def _patch_table_branch(monkeypatch):
    """Force the table-scored fast path on the CPU mesh: enable the fused
    gate and run the kernel in interpret mode with exact f32 matmuls (same
    pattern as tests/test_fused_table_infonce.py)."""
    from transformer_recommenders_tpu.ops import fused_table_infonce as FT
    from transformer_recommenders_tpu.training import train_state as TS

    monkeypatch.setattr(TS, "_fused_loss_enabled", lambda c: True)
    monkeypatch.setattr(FT, "_MATMUL_DTYPE", jnp.float32)
    orig = FT.fused_table_infonce_loss

    def interp(*args, **kw):
        kw["interpret"] = True
        kw["tile_rows"] = 16
        return orig(*args, **kw)

    monkeypatch.setattr(FT, "fused_table_infonce_loss", interp)


@pytest.mark.parametrize("mesh_name", ["mesh2x4", "mesh8x1"])
def test_sharded_fast_step_table_branch_matches_pool(
    mesh_name, request, monkeypatch
):
    """The sharded fast step routes small-catalog InfoNCE through the
    table-scored kernel (psum'd global pool counts + model-axis table
    all-gather) and must equal the pool-based sharded objective AND the
    single-device table-branch loss — the distributed-invariant global
    negative pool realized as one (N,) count psum."""
    from transformer_recommenders_tpu.parallel.train import make_sharded_loss
    from transformer_recommenders_tpu.training import train_state as TS

    mesh = request.getfixturevalue(mesh_name)
    cfg, params, table, batch = _make_setup()
    # disjoint pos/neg ranges: duplicates of a row's positive in the pool
    # tie exactly in the kernel's one-matmul layout but by 1 ulp in the XLA
    # path's elementwise pos logits (see tests/test_fused_table_infonce.py)
    n_items = table.shape[0] - 1
    half = n_items // 2
    batch["pos_item_idx"] = RNG.integers(
        1, half + 1, size=batch["pos_item_idx"].shape
    ).astype(np.int32)
    batch["neg_item_idx"] = RNG.integers(
        half + 1, n_items + 1, size=batch["neg_item_idx"].shape
    ).astype(np.int32)
    batch["history_item_idx"][-1] = 0  # keep a padded row

    placed_table = pemb.place_table(table, mesh)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    rng = jax.random.key(5)

    pool_loss, _ = jax.jit(make_sharded_loss(cfg, mesh, full_logs=True))(
        params, placed_table, sh_batch, rng
    )

    _patch_table_branch(monkeypatch)
    assert TS._table_loss_enabled(
        cfg, table.shape[0], batch["history_item_idx"].size
    )
    fast = make_sharded_loss(cfg, mesh, full_logs=False)
    table_loss, fast_logs = jax.jit(fast)(params, placed_table, sh_batch, rng)

    np.testing.assert_allclose(float(table_loss), float(pool_loss), rtol=1e-5)
    assert "batch/positive_non_zero" in fast_logs

    # single-device table branch agrees too
    single = TS.make_train_step(cfg, full_logs=False)
    _, single_logs = single(
        init_train_state(cfg, params), jnp.asarray(table), batch, rng
    )
    np.testing.assert_allclose(
        float(fast_logs["loss/InfoNCELoss"]),
        float(single_logs["loss/InfoNCELoss"]),
        rtol=1e-5,
    )


def test_sharded_fast_step_table_branch_grads_match_pool(mesh2x4, monkeypatch):
    """Gradients through the table branch (dense d(table) reduce-scattered
    to shards -> input_proj via the local projection) equal the pool-path
    gradients.  Uses a projected table (input_dim != hidden) so the
    all-gather transpose actually carries gradient."""
    from transformer_recommenders_tpu.parallel.train import make_sharded_loss
    from transformer_recommenders_tpu.training import train_state as TS

    cfg, params, table, batch = _make_setup(d=16)
    cfg = cfg.model_copy(update={"input_dim": 24, "hidden_size": 16})
    params = init_transformer_params(jax.random.key(0), cfg)
    table = RNG.normal(size=(41, 24)).astype(np.float32)
    table[0] = 0
    n_items = 40
    half = n_items // 2
    batch["pos_item_idx"] = RNG.integers(
        1, half + 1, size=batch["pos_item_idx"].shape
    ).astype(np.int32)
    batch["neg_item_idx"] = RNG.integers(
        half + 1, n_items + 1, size=batch["neg_item_idx"].shape
    ).astype(np.int32)

    placed_table = pemb.place_table(table, mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)
    rng = jax.random.key(5)

    def grads_of(loss_fn):
        g = jax.jit(
            jax.grad(lambda p: loss_fn(p, placed_table, sh_batch, rng)[0])
        )(params)
        return jax.tree.leaves(g)

    pool_grads = grads_of(make_sharded_loss(cfg, mesh2x4, full_logs=True))
    _patch_table_branch(monkeypatch)
    table_grads = grads_of(make_sharded_loss(cfg, mesh2x4, full_logs=False))
    for a, b_ in zip(pool_grads, table_grads):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_sharded_step_with_fused_layer_matches_xla(mesh2x4, monkeypatch):
    """The full-layer megafusion kernel (interpret mode) inside the
    sharded shard_map step produces the XLA layer stack's loss and
    parameter updates — the kernel composes with the mesh collectives."""
    from transformer_recommenders_tpu.models import transformer as TM

    # tiny dims: the monkeypatched gate bypasses the 128-multiple shape
    # check, and interpret mode across 8 virtual devices is slow
    cfg, params, table, batch = _make_setup()
    # disjoint pos/neg ranges: the false-negative mask compares logits for
    # EXACT equality, so a pool duplicate of a row's positive lets last-ulp
    # encoder differences (fused kernel vs XLA) flip the mask and change
    # the summed loss discretely (same caveat as the table-branch tests)
    n_items = table.shape[0] - 1
    half = n_items // 2
    batch["pos_item_idx"] = RNG.integers(
        1, half + 1, size=batch["pos_item_idx"].shape
    ).astype(np.int32)
    batch["neg_item_idx"] = RNG.integers(
        half + 1, n_items + 1, size=batch["neg_item_idx"].shape
    ).astype(np.int32)
    rng = jax.random.key(7)

    placed_table = pemb.place_table(table, mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)

    def run():
        sh_state = place_state(init_train_state(cfg, params), mesh2x4)
        step = make_sharded_train_step(cfg, mesh2x4)
        return step(sh_state, placed_table, sh_batch, rng)

    ref_state, ref_logs = run()
    monkeypatch.setattr(TM, "_fused_layer_mode", lambda c, s: "interpret")
    fused_state, fused_logs = run()

    np.testing.assert_allclose(
        float(fused_logs["loss/InfoNCELoss"]),
        float(ref_logs["loss/InfoNCELoss"]),
        rtol=1e-5,
    )
    # step-1 AdamW normalizes each element to ~+/-lr, amplifying last-ulp
    # gradient differences; 1e-4 = 10% of one 1e-3 update
    for a, b_ in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(fused_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-4, atol=1e-4
        )


def test_scanned_sharded_matches_looped_sharded(mesh8x1):
    """K scanned sharded steps == K looped sharded steps (scan dispatch
    changes nothing but the host/program structure); and the first scanned
    loss equals the single-device loss on the same batch."""
    from transformer_recommenders_tpu.training.scan_steps import (
        make_scanned_train_steps,
        stack_batches,
    )
    from jax.sharding import NamedSharding

    cfg, params, table, _ = _make_setup()
    k, b, s = 3, 8, 4
    rng_np = np.random.default_rng(11)
    batches = []
    for _ in range(k):
        batches.append({
            "history_item_idx": rng_np.integers(1, 41, size=(b, s)).astype(np.int32),
            "pos_item_idx": rng_np.integers(0, 41, size=(b, s)).astype(np.int32),
            "neg_item_idx": rng_np.integers(1, 41, size=(b, s)).astype(np.int32),
        })
    root_key = jax.random.key(3)
    placed_table = pemb.place_table(table, mesh8x1)

    # reference: K looped sharded steps with the same fold_in(step) keys
    ref_state = place_state(init_train_state(cfg, params), mesh8x1)
    ref_step = make_sharded_train_step(cfg, mesh8x1)
    ref_losses = []
    for i in range(k):
        step_key = jax.random.fold_in(root_key, i)
        sh_batch = pmesh.shard_batch(
            {kk: jnp.asarray(v) for kk, v in batches[i].items()}, mesh8x1
        )
        ref_state, ref_logs = ref_step(ref_state, placed_table, sh_batch, step_key)
        ref_losses.append(float(ref_logs[f"loss/{cfg.train_loss}"]))

    # scanned sharded dispatch
    sh_state = place_state(init_train_state(cfg, params), mesh8x1)
    window = stack_batches(batches)
    window_sharding = NamedSharding(mesh8x1, P(None, "data"))
    window = {key: jax.device_put(v, window_sharding) for key, v in window.items()}
    scan_fn = make_scanned_train_steps(cfg, mesh=mesh8x1)
    sh_state, logs = scan_fn(sh_state, placed_table, window, root_key)

    losses = np.asarray(logs[f"loss/{cfg.train_loss}"])
    assert losses.shape == (k,)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)

    # single-device loss on batch 0 agrees with the scanned-sharded loss
    sd_step = make_train_step(cfg)
    _, sd_logs = sd_step(
        init_train_state(cfg, params), jnp.asarray(table), batches[0],
        jax.random.fold_in(root_key, 0),
    )
    np.testing.assert_allclose(
        losses[0], float(sd_logs[f"loss/{cfg.train_loss}"]), rtol=1e-4
    )

    for a, b_ in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6)


def test_orbax_roundtrip_of_sharded_state(mesh2x4, tmp_path):
    """Orbax checkpoint of a mesh-placed TrainState restores exactly,
    preserving shardings (multi-host readiness on the virtual mesh)."""
    from transformer_recommenders_tpu.training import checkpoint as ckpt_lib

    cfg, params, table, batch = _make_setup()
    placed_table = pemb.place_table(table, mesh2x4)
    state = place_state(init_train_state(cfg, params), mesh2x4)
    sh_batch = pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh2x4)
    step = make_sharded_train_step(cfg, mesh2x4)
    state, _ = step(state, placed_table, sh_batch, jax.random.key(0))

    ckpt_lib.save_checkpoint(
        tmp_path / "orb", state, epoch=0, metrics={"m": 1.0}, backend="orbax"
    )
    template = place_state(init_train_state(cfg, params), mesh2x4)
    restored, meta = ckpt_lib.load_checkpoint(tmp_path / "orb", template)
    assert meta["metrics"] == {"m": 1.0}
    for a, b_ in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # device placement preserved for the restored params
    leaf = jax.tree.leaves(restored.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_orbax_reachable_from_train_config(tmp_path):
    """checkpoint_backend='orbax' wired through Trainer.fit (VERDICT weak #8)."""
    from transformer_recommenders_tpu.configs import SeqDataModuleConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=16,
        max_seq_length=8,
        batch_size=16,
        synthetic_num_users=30,
        synthetic_num_items=40,
        synthetic_num_events=2000,
    )
    config = TrainConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=8,
        compute_dtype="float32",
        max_epochs=1,
        limit_train_batches=3,
        eval_batch_size=16,
        top_k=5,
        log_every_n_steps=1000,
        ckpt_dir=str(tmp_path / "ckpt"),
        checkpoint_backend="orbax",
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "lg"))
    trainer.fit()
    assert (tmp_path / "ckpt" / "last" / "orbax").exists()
    # resume from the orbax checkpoint
    trainer2 = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "l2"))
    meta = trainer2.restore(str(tmp_path / "ckpt" / "last"))
    assert meta["step"] == int(trainer.state.step)
    for a, b_ in zip(
        jax.tree.leaves(trainer.state.params), jax.tree.leaves(trainer2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_sharded_predict_matches_unsharded(mesh2x4):
    """ShardedEvaluator.recommend_batch == Evaluator.recommend_batch."""
    from transformer_recommenders_tpu.data.module import EvalArrays
    from transformer_recommenders_tpu.training.evaluator import (
        Evaluator,
        ShardedEvaluator,
    )

    cfg, params, table, _ = _make_setup()
    cfg = cfg.model_copy(update={"top_k": 7, "eval_batch_size": 8})
    n_users, n_items = 10, 40
    histories = RNG.integers(1, n_items + 1, size=(n_users, 6)).astype(np.int32)
    arrays = EvalArrays(
        user_ids=np.asarray([str(u) for u in range(n_users)], object),
        histories=[h for h in histories],
        history_window=histories[:, -4:],
        target_lists=RNG.integers(1, n_items + 1, size=(n_users, 3)).astype(np.int32),
        n_targets=np.full(n_users, 3, np.int32),
    )

    ev = Evaluator(cfg)
    idx_ref, scores_ref = ev.recommend_batch(params, jnp.asarray(table), arrays)

    placed_table = pemb.place_table(table, mesh2x4)
    placed_items = pemb.place_table(table[1:], mesh2x4)
    sev = ShardedEvaluator(cfg, mesh2x4, num_items=n_items)
    idx_sh, scores_sh = sev.recommend_batch(
        params, (placed_table, placed_items), arrays
    )
    np.testing.assert_array_equal(idx_sh, idx_ref)
    np.testing.assert_allclose(scores_sh, scores_ref, rtol=1e-5, atol=1e-6)

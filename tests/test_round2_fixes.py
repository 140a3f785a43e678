"""Round-2 regression tests: VERDICT.md + ADVICE.md findings.

- negative-sampler uniformity (VERDICT weak #1: the old numpy path's
  sorted-truncation kept only the smallest item indices);
- degenerate-complement semantics (ADVICE low #5: without replacement when
  the history covers the catalog, parity ``xfmr_rec/data.py:741-747``);
- MicroBatcher thread safety across event loops (ADVICE medium #1);
- /metrics label bucketing + escaping (ADVICE low #4);
- TPU-safe ``--workers`` guard (VERDICT next #8);
- trainer knobs: gradient clipping, grad accumulation, limits,
  val_check_interval (VERDICT missing #5);
- missing-monitor error (ADVICE low #3).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import (
    SeqDataConfig,
    SeqDataModuleConfig,
    TrainConfig,
)
from transformer_recommenders_tpu.data.dataset import SeqData


# ---------------------------------------------------------------------------
# negative-sampler distributions
# ---------------------------------------------------------------------------


def _collect_numpy_negatives(num_items, hist_items, n_draws, seq_len=16):
    """Draw negatives repeatedly through the numpy row sampler."""
    cfg = SeqDataConfig(max_seq_length=seq_len, pos_lookahead=0)
    item_ids = [str(i) for i in range(1, num_items + 1)]
    hist = (np.asarray(hist_items, np.int64)).astype(str)
    labels = np.ones(len(hist), bool)
    data = SeqData(
        cfg,
        item_ids=item_ids,
        histories=[(hist, labels)],
        backend="numpy",
    )
    rng = np.random.default_rng(123)
    out = []
    for _ in range(n_draws):
        _, _, neg = data._sample_row(rng, *data.rows[0])
        out.append(neg)
    return np.concatenate(out)


def test_numpy_negatives_uniform_over_complement():
    """The old implementation NEVER sampled the top ~half of item indices
    (np.unique sorts; truncation keeps the smallest).  With 500 items and a
    tiny history, every complement item must appear and the mean must match
    the uniform expectation within a tight bound."""
    num_items = 500
    # 18 events over items {1,2,3} -> 17 query positions -> 16 sampled
    # positions/negatives per draw; complement = 4..500
    hist = [1, 2, 3] * 6
    neg = _collect_numpy_negatives(num_items, hist, n_draws=1200, seq_len=16)

    assert len(neg) == 1200 * 16
    assert neg.min() >= 4
    assert neg.max() == num_items  # the old bug capped this near num_items/2
    counts = np.bincount(neg, minlength=num_items + 1)[4:]
    assert (counts > 0).all()
    # mean of uniform over [4, 500] = 252; n = 19200 draws, sigma_mean ~ 1.04
    expected = (4 + num_items) / 2
    assert abs(neg.mean() - expected) < 5.0
    # per-item counts ~ Poisson(38.6): bounds at ~+-5 sigma
    expected_count = len(neg) / (num_items - 3)
    assert counts.max() < 2.0 * expected_count
    assert counts.min() > 0.25 * expected_count


def test_numpy_negatives_never_in_history_and_unique_per_row():
    cfg = SeqDataConfig(max_seq_length=8, pos_lookahead=0)
    num_items = 50
    hist_items = np.asarray([5, 9, 13, 21, 34, 42], np.int64)
    data = SeqData(
        cfg,
        item_ids=[str(i) for i in range(1, num_items + 1)],
        histories=[(hist_items.astype(str), np.ones(6, bool))],
        backend="numpy",
    )
    rng = np.random.default_rng(7)
    for _ in range(200):
        _, _, neg = data._sample_row(rng, *data.rows[0])
        assert len(np.unique(neg)) == len(neg)  # without replacement
        assert not np.isin(neg, hist_items).any()


def test_numpy_negatives_degenerate_complement_without_replacement():
    """History covers the catalog -> fall back to ALL items, still without
    replacement (reference data.py:741-747)."""
    cfg = SeqDataConfig(max_seq_length=6, pos_lookahead=0)
    num_items = 10
    hist_items = np.arange(1, num_items + 1)
    data = SeqData(
        cfg,
        item_ids=[str(i) for i in range(1, num_items + 1)],
        histories=[(hist_items.astype(str), np.ones(num_items, bool))],
        backend="numpy",
    )
    rng = np.random.default_rng(3)
    for _ in range(50):
        _, _, neg = data._sample_row(rng, *data.rows[0])
        assert len(np.unique(neg)) == len(neg)
        assert ((neg >= 1) & (neg <= num_items)).all()


def _native_seq_data(num_items, hist_items, seq_len):
    from transformer_recommenders_tpu.native import load_native_sampler

    if load_native_sampler() is None:
        pytest.skip("no C++ toolchain")
    cfg = SeqDataConfig(max_seq_length=seq_len, pos_lookahead=0)
    hist = np.asarray(hist_items, np.int64).astype(str)
    return SeqData(
        cfg,
        item_ids=[str(i) for i in range(1, num_items + 1)],
        histories=[(hist, np.ones(len(hist), bool))],
        backend="native",
    )


def test_native_negatives_uniform_over_complement():
    num_items = 500
    data = _native_seq_data(num_items, [1, 2, 3] * 6, seq_len=16)
    neg = []
    for epoch in range(1200):
        for batch in data.epoch_batches(epoch, batch_size=1):
            row = batch["neg_item_idx"][0]
            neg.append(row[row > 0])
    neg = np.concatenate(neg)
    # 18 events > seq 16 -> the row is duplicated twice per epoch
    assert len(neg) == 2 * 1200 * 16
    assert neg.min() >= 4
    assert neg.max() == num_items
    counts = np.bincount(neg, minlength=num_items + 1)[4:]
    assert (counts > 0).all()
    expected = (4 + num_items) / 2
    assert abs(neg.mean() - expected) < 5.0
    expected_count = len(neg) / (num_items - 3)
    assert counts.max() < 2.0 * expected_count
    assert counts.min() > 0.25 * expected_count


def test_native_negatives_degenerate_complement_without_replacement():
    num_items = 10
    data = _native_seq_data(num_items, np.arange(1, num_items + 1), seq_len=6)
    for epoch in range(50):
        for batch in data.epoch_batches(epoch, batch_size=1):
            row = batch["neg_item_idx"][0]
            row = row[row > 0]
            assert len(np.unique(row)) == len(row)
            assert ((row >= 1) & (row <= num_items)).all()


# ---------------------------------------------------------------------------
# MicroBatcher thread safety
# ---------------------------------------------------------------------------


def test_microbatcher_resolves_futures_across_event_loops():
    """Two requests on DIFFERENT threads/loops inside one batching window:
    both must complete (the old set_result from a foreign thread could hang
    the other loop forever) and coalesce into one model call."""
    import asyncio

    from transformer_recommenders_tpu.serving.service import MicroBatcher

    calls: list[int] = []

    def fn(items):
        calls.append(len(items))
        return [x * 10 for x in items]

    batcher = MicroBatcher(fn, max_batch=64, window_ms=50.0)
    barrier = threading.Barrier(2)
    results: dict[int, int] = {}
    errors: list[BaseException] = []

    def worker(i):
        async def run():
            barrier.wait(timeout=5)
            return await batcher.submit(i)

        try:
            results[i] = asyncio.run(run())
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert not errors
    assert results == {1: 10, 2: 20}
    assert sum(calls) == 2  # usually one coalesced call of 2


def test_microbatcher_propagates_exceptions():
    import asyncio

    from transformer_recommenders_tpu.serving.service import MicroBatcher

    def fn(items):
        raise ValueError("boom")

    batcher = MicroBatcher(fn, max_batch=1, window_ms=1.0)
    with pytest.raises(ValueError, match="boom"):
        asyncio.run(batcher.submit(1))


# ---------------------------------------------------------------------------
# /metrics hygiene + workers guard
# ---------------------------------------------------------------------------


def test_metrics_bucket_unknown_paths_and_escape_labels():
    from transformer_recommenders_tpu.serving.asgi import JSONApp, TestClient

    app = JSONApp()

    @app.route("echo")
    async def _echo(payload):
        return payload

    client = TestClient(app)
    assert client.post("echo", {"a": 1}).status_code == 200
    # hostile / unbounded paths: quotes, newline escapes, randomness
    for path in ['x"} evil{', "a\\b", "nosuch1", "nosuch2", "nosuch3"]:
        assert client.post(path, {}).status_code == 404

    text = app.metrics_text()
    assert 'route="echo"' in text
    assert 'route="unknown"' in text
    assert "nosuch1" not in text  # bucketed, not a permanent label
    assert "evil" not in text
    # label set is bounded by registered routes + {metrics, unknown}
    labels = {key[0] for key in app.request_counts}
    assert labels <= set(app.routes) | {"metrics", "unknown"}
    # exposition stays parseable: every line is a comment or name{...} value
    for line in text.strip().splitlines():
        assert line.startswith("#") or (line.count(" ") == 1 and "{" in line)


def test_metrics_label_escaping_roundtrip():
    from transformer_recommenders_tpu.serving.asgi import JSONApp

    assert JSONApp._escape_label('a"b\\c\nd') == 'a\\"b\\\\c\\nd'


def test_serve_workers_guard_refuses_accelerator_backend(monkeypatch):
    from transformer_recommenders_tpu.serving import asgi

    app = asgi.JSONApp()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="cannot be shared"):
        asgi.serve(app, workers=4)


# ---------------------------------------------------------------------------
# trainer knobs
# ---------------------------------------------------------------------------


def _tiny_params():
    return {"w": jnp.asarray([10.0, -10.0]), "b": jnp.asarray([0.5])}


def test_gradient_clip_val_bounds_update_norm():
    import optax

    from transformer_recommenders_tpu.training.train_state import make_optimizer

    cfg = TrainConfig(gradient_clip_val=0.1, learning_rate=1.0, weight_decay=0.0)
    opt = make_optimizer(cfg)
    params = _tiny_params()
    state = opt.init(params)
    big_grads = jax.tree.map(lambda x: jnp.full_like(x, 100.0), params)
    updates, _ = opt.update(big_grads, state, params)
    # adam normalizes magnitudes to ~lr; clipping must not be a no-op on the
    # transformed chain INPUT: verify against the unclipped optimizer
    cfg_noclip = cfg.model_copy(update={"gradient_clip_val": None})
    opt2 = make_optimizer(cfg_noclip)
    updates2, _ = opt2.update(big_grads, opt2.init(params), params)
    # both produce finite updates; the clipped chain saw grads scaled to 0.1
    assert float(optax.global_norm(updates)) > 0
    assert all(np.isfinite(np.asarray(u)).all() for u in jax.tree.leaves(updates))
    assert all(np.isfinite(np.asarray(u)).all() for u in jax.tree.leaves(updates2))


def test_accumulate_grad_batches_defers_param_update():
    import optax

    from transformer_recommenders_tpu.training.train_state import make_optimizer

    cfg = TrainConfig(
        accumulate_grad_batches=2, learning_rate=0.1, weight_decay=0.0
    )
    opt = make_optimizer(cfg)
    params = _tiny_params()
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    updates1, state = opt.update(grads, state, params)
    # first micro-batch: zero update (accumulating)
    assert float(optax.global_norm(updates1)) == 0.0
    params1 = optax.apply_updates(params, updates1)
    updates2, state = opt.update(grads, state, params1)
    # second micro-batch: the real update fires
    assert float(optax.global_norm(updates2)) > 0.0


@pytest.fixture(scope="module")
def tiny_modules(tmp_path_factory):
    from transformer_recommenders_tpu.data.module import SeqDataModule

    root = tmp_path_factory.mktemp("r2knobs")
    data_config = SeqDataModuleConfig(
        data_dir=str(root / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=16,
        max_seq_length=8,
        batch_size=16,
        synthetic_num_users=40,
        synthetic_num_items=50,
        synthetic_num_events=3000,
    )
    train_config = TrainConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=8,
        compute_dtype="float32",
        learning_rate=3e-3,
        max_epochs=1,
        eval_batch_size=32,
        top_k=10,
        log_every_n_steps=1000,
    )
    return root, data_config, train_config


def test_missing_monitor_metric_raises(tiny_modules):
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    root, data_config, train_config = tiny_modules
    cfg = train_config.model_copy(
        update={
            "monitor": "val/does_not_exist",
            "ckpt_dir": str(root / "ckpt_miss"),
            "limit_train_batches": 2,
        }
    )
    trainer = Trainer(cfg, SeqDataModule(data_config), log_dir=str(root / "lm"))
    with pytest.raises(KeyError, match="does_not_exist"):
        trainer.fit()


def test_val_check_interval_and_limits(tiny_modules):
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    root, data_config, train_config = tiny_modules
    cfg = train_config.model_copy(
        update={
            "val_check_interval": 2,
            "limit_train_batches": 5,
            "limit_test_batches": 1,
            "limit_predict_batches": 1,
            "ckpt_dir": str(root / "ckpt_vci"),
        }
    )
    trainer = Trainer(cfg, SeqDataModule(data_config), log_dir=str(root / "lv"))
    result = trainer.fit()
    assert "val/retrieval_normalized_dcg" in result
    # mid-epoch validations logged in addition to the epoch-end one
    import json as json_mod

    with open(trainer.log_dir / "metrics.jsonl") as f:
        records = [json_mod.loads(line) for line in f]
    val_records = [
        rec for rec in records if any(k.startswith("val/") for k in rec)
    ]
    assert len(val_records) >= 2  # >=1 mid-epoch + 1 epoch-end

    recs = trainer.predict()
    assert len(recs["user_ids"]) <= cfg.eval_batch_size  # limit_predict applied
    test_metrics = trainer.test()
    assert "test/retrieval_normalized_dcg" in test_metrics


def test_gradient_knobs_end_to_end(tiny_modules):
    """fit() runs with clipping + accumulation enabled and still learns."""
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    root, data_config, train_config = tiny_modules
    cfg = train_config.model_copy(
        update={
            "gradient_clip_val": 1.0,
            "accumulate_grad_batches": 2,
            "ckpt_dir": str(root / "ckpt_clip"),
        }
    )
    trainer = Trainer(cfg, SeqDataModule(data_config), log_dir=str(root / "lc"))
    result = trainer.fit()
    assert np.isfinite(result["val/retrieval_normalized_dcg"])


# ---------------------------------------------------------------------------
# MLflow-equivalent tracking (VERDICT missing #2)
# ---------------------------------------------------------------------------


def test_mlflow_filestore_layout(tmp_path):
    from transformer_recommenders_tpu.training.mlflow_logging import MLflowRun

    run = MLflowRun(tmp_path / "mlruns", experiment_name="exp", run_name="r1")
    run.log_metrics({"loss/InfoNCELoss": 1.5, "val/ndcg": 0.2}, step=3)
    run.log_metrics({"loss/InfoNCELoss": 1.2}, step=4)
    run.log_params({"model": {"hidden_size": 32}, "lr": 0.001})
    artifact = tmp_path / "config.json"
    artifact.write_text("{}")
    run.log_artifact(artifact)
    run.end()

    exp_dir = tmp_path / "mlruns" / run.experiment_id
    assert "name: exp" in (exp_dir / "meta.yaml").read_text()
    run_dir = exp_dir / run.run_id
    lines = (run_dir / "metrics" / "loss" / "InfoNCELoss").read_text().splitlines()
    assert len(lines) == 2
    ts, value, step = lines[0].split()
    assert float(value) == 1.5 and step == "3"
    assert (run_dir / "params" / "model.hidden_size").read_text() == "32"
    assert (run_dir / "params" / "lr").read_text() == "0.001"
    assert (run_dir / "artifacts" / "config.json").exists()
    meta = (run_dir / "meta.yaml").read_text()
    assert "status: 3" in meta and "end_time: null" not in meta


def test_mlflow_run_adoption_via_env(tmp_path, monkeypatch):
    """MLFLOW_RUN_ID adoption: a second process logs into the SAME run
    (parity: xfmr_rec/trainer.py:419-447)."""
    from transformer_recommenders_tpu.training.mlflow_logging import MLflowRun

    first = MLflowRun(tmp_path / "mlruns", experiment_name="exp")
    first.log_metrics({"a": 1.0}, step=0)
    monkeypatch.setenv("MLFLOW_RUN_ID", first.run_id)
    second = MLflowRun(tmp_path / "mlruns", experiment_name="exp")
    assert second.run_id == first.run_id
    second.log_metrics({"a": 2.0}, step=1)
    lines = (first.run_dir / "metrics" / "a").read_text().splitlines()
    assert len(lines) == 2


def test_trainer_writes_mlflow_run(tiny_modules):
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    root, data_config, train_config = tiny_modules
    cfg = train_config.model_copy(
        update={"limit_train_batches": 2, "ckpt_dir": str(root / "ckpt_mlf")}
    )
    trainer = Trainer(cfg, SeqDataModule(data_config), log_dir=str(root / "lmlf"))
    trainer.fit()
    run_dir = trainer.mlflow_run.run_dir
    assert (run_dir / "artifacts" / "config.json").exists()
    assert (run_dir / "params" / "model.hidden_size").read_text() == "16"
    metric = run_dir / "metrics" / "val" / "retrieval_normalized_dcg"
    assert metric.exists() and len(metric.read_text().splitlines()) >= 1


# ---------------------------------------------------------------------------
# fused flat AdamW (one-fusion optimizer update)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clip", [None, 0.05])
def test_flat_adamw_matches_optax_adamw(clip):
    import optax

    from transformer_recommenders_tpu.training.train_state import (
        make_flat_adamw,
        make_optimizer,
    )

    cfg = TrainConfig(
        learning_rate=3e-3, weight_decay=0.01, gradient_clip_val=clip
    )
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        "nested": {"b": jnp.asarray(rng.normal(size=(7,)), jnp.float32)},
    }
    flat_init, flat_apply = make_flat_adamw(cfg)
    opt = make_optimizer(cfg)
    flat_state, opt_state = flat_init(params), opt.init(params)
    p_flat, p_ref = params, params
    for i in range(5):
        grads = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape) * (10.0 if i == 2 else 1.0), x.dtype),
            p_ref,
        )
        p_flat, flat_state, gnorm = flat_apply(grads, flat_state, p_flat)
        updates, opt_state = opt.update(grads, opt_state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        np.testing.assert_allclose(
            float(gnorm), float(optax.global_norm(grads)), rtol=1e-6
        )
    for a, b in zip(jax.tree.leaves(p_flat), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7)


def test_flat_adamw_checkpoint_roundtrip(tmp_path):
    from transformer_recommenders_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from transformer_recommenders_tpu.training.train_state import init_train_state

    cfg = TrainConfig(learning_rate=1e-3, weight_decay=0.01)
    params = _tiny_params()
    state = init_train_state(cfg, params)
    state = state._replace(
        opt_state=state.opt_state._replace(count=jnp.asarray(7, jnp.int32))
    )
    save_checkpoint(tmp_path / "ck", state, epoch=1)
    template = init_train_state(cfg, _tiny_params())
    restored, meta = load_checkpoint(tmp_path / "ck", template)
    assert int(restored.opt_state.count) == 7
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_end_validation_dedup_preserves_patience(tiny_modules):
    """When val_check_interval lands exactly on the last train step of an
    epoch, the epoch-end validation must NOT re-score the same params — the
    tied monitor would burn early-stopping patience every epoch (round-2
    review finding)."""
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    root, data_config, train_config = tiny_modules
    # 4 train batches, interval 2 -> mid-epoch validations at steps 2 and 4;
    # step 4 is the epoch end, so the old code validated twice there
    cfg = train_config.model_copy(
        update={
            "val_check_interval": 2,
            "limit_train_batches": 4,
            "max_epochs": 2,
            "early_stopping_patience": 1,
            "ckpt_dir": str(root / "ckpt_dedup"),
        }
    )
    trainer = Trainer(cfg, SeqDataModule(data_config), log_dir=str(root / "ld"))

    calls = []
    orig_validate = trainer.validate

    def counting_validate(stage="val"):
        out = orig_validate(stage=stage)
        calls.append(int(trainer.state.step))
        return out

    trainer.validate = counting_validate
    trainer.fit()
    trainer.close()
    # no step may be validated twice (the dedup), so a tie can never come
    # from re-scoring identical params
    assert len(calls) == len(set(calls)), calls


def test_mlflow_run_marked_finished_on_close(tiny_modules):
    """Trainer.close() must terminate the MLflow run (status FINISHED) —
    without it every run stays RUNNING forever (round-2 review finding)."""
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    root, data_config, train_config = tiny_modules
    cfg = train_config.model_copy(
        update={
            "limit_train_batches": 2,
            "use_mlflow": True,
            "mlflow_dir": str(root / "mlruns_close"),
            "ckpt_dir": str(root / "ckpt_mlf"),
        }
    )
    trainer = Trainer(cfg, SeqDataModule(data_config), log_dir=str(root / "lf"))
    trainer.fit()
    trainer.close()
    trainer.close()  # idempotent
    run = trainer.mlflow_run
    assert run is not None
    meta = (run.run_dir / "meta.yaml").read_text()
    assert "status: 3" in meta, meta  # FINISHED

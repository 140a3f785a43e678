"""Targeted edge-case coverage: exclusion scatter, mesh validation, CLIs."""

import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import MeshConfig
from transformer_recommenders_tpu.ops.topk import mask_excluded, topk_items
from transformer_recommenders_tpu.parallel.mesh import create_mesh


def test_mask_excluded_pad_zero_never_hits_item_one():
    """Exclusion padding (idx 0) must NOT mask item idx 1 (column 0) — pads
    route to an out-of-range column and drop."""
    scores = jnp.ones((2, 5))
    exclude = jnp.asarray([[0, 0, 0], [2, 0, 0]], jnp.int32)
    out = np.asarray(mask_excluded(scores, exclude))
    # row 0: nothing excluded (all pads)
    assert np.isfinite(out[0]).all()
    # row 1: only item idx 2 (column 1) masked
    assert not np.isfinite(out[1, 1])
    assert np.isfinite(out[1, [0, 2, 3, 4]]).all()


def test_topk_with_more_exclusions_than_items():
    items = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    q = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8)), jnp.float32)
    exclude = jnp.asarray([[1, 2, 3, 4, 1, 2]], jnp.int32)  # everything
    scores, idx = topk_items(q, items, 4, exclude_idx=exclude)
    assert not np.isfinite(np.asarray(scores)).any()  # nothing left


def test_create_mesh_validation():
    with pytest.raises(ValueError, match="not divisible"):
        create_mesh(MeshConfig(model_axis_size=3))  # 8 % 3 != 0
    with pytest.raises(ValueError, match="exceeds"):
        create_mesh(MeshConfig(data_axis_size=8, model_axis_size=2))
    mesh = create_mesh(MeshConfig())  # defaults: all devices, model=1
    assert mesh.shape == {"data": 8, "model": 1}


def test_module_entrypoints_importable():
    """`python -m ...cli` paths resolve (module __main__ smoke without
    spawning subprocesses)."""
    import importlib

    for mod in [
        "transformer_recommenders_tpu.training.cli",
        "transformer_recommenders_tpu.data.cli",
        "transformer_recommenders_tpu.serving.deploy",
    ]:
        m = importlib.import_module(mod)
        assert hasattr(m, "main") or hasattr(m, "cli_main")


def test_record_store_unicode_and_quotes():
    """Ids containing quotes (the reference escapes them for SQL,
    index.py:241) must round-trip through the store."""
    import pandas as pd

    from transformer_recommenders_tpu.index.store import RecordStore

    records = pd.DataFrame(
        {"item_id": ["o'brien", 'say "hi"', "émile"], "item_text": ["a", "b", "c"]}
    )
    store = RecordStore(records, "item_id")
    assert store.get_id("o'brien")["item_text"] == "a"
    assert store.get_id('say "hi"')["item_text"] == "b"
    assert store.get_id("émile")["item_text"] == "c"
    assert [r["item_id"] for r in store.get_ids(['say "hi"', "o'brien"])] == [
        "o'brien",
        'say "hi"',
    ]


def test_package_import_does_not_initialize_backend():
    """A module-level jnp scalar used to dispatch convert_element_type at
    import, initializing the XLA backend BEFORE jax.distributed.initialize
    could run (and hanging imports when the accelerator is unreachable).
    Importing the full surface must leave the backend untouched."""
    import subprocess
    import sys

    code = (
        "import transformer_recommenders_tpu.training.cli\n"
        "import transformer_recommenders_tpu.serving.service\n"
        "import transformer_recommenders_tpu.index.device_index\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, sorted(xla_bridge._backends)\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clean" in out.stdout


def test_two_stage_topk_matches_direct_at_batch1():
    """The batch-1 two-stage blocked top-k (ops/topk._two_stage_topk) must
    be EXACTLY the direct lax.top_k result — same items, same scores —
    including with exclusions (round-4 single-query latency gate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_recommenders_tpu.ops import topk as T

    rng = np.random.default_rng(7)
    n, d, k = 8192, 32, 64
    items = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))
    exclude = jnp.asarray(
        rng.integers(1, n + 1, size=(1, 17)).astype(np.int32)
    )
    # the gate needs n >= blocks * k * 4 = 4096 at k=64 -> n=8192 takes
    # the two-stage path at batch 1; batch 2 takes the direct path
    scores2, idx2 = T.topk_items(q, items, k, exclude_idx=exclude)
    direct = jax.lax.top_k(
        T.mask_excluded(T.score_items(q, items), exclude), k
    )
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(direct[1]) + 1)
    np.testing.assert_allclose(np.asarray(scores2), np.asarray(direct[0]))
    # excluded ids never appear
    assert not set(np.asarray(idx2).ravel()) & set(np.asarray(exclude).ravel())
    # batched queries agree row-wise with single-query results
    qb = jnp.concatenate([q, q], axis=0)
    sb, ib = T.topk_items(qb, items, k)
    s1, i1 = T.topk_items(q, items, k)
    np.testing.assert_array_equal(np.asarray(ib[0]), np.asarray(i1[0]))

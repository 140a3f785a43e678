"""Golden-value retrieval-metric tests.

Hand-computed expectations follow the reference protocol
(``xfmr_rec/metrics.py:62-78``): ranked rec list padded to top_k, missing
targets appended after, linspace scores, binary relevance, torchmetrics
functional semantics at ``top_k``.
"""

import jax.numpy as jnp
import numpy as np

from transformer_recommenders_tpu.ops.metrics import (
    aggregate_metrics,
    compute_retrieval_metrics,
    retrieval_metrics,
)


def run_one(rel, n_targets, top_k):
    out = retrieval_metrics(
        jnp.asarray([rel], jnp.float32), jnp.asarray([n_targets]), top_k
    )
    return {k: float(v[0]) for k, v in out.items()}


def test_perfect_ranking():
    # 2 targets, both retrieved at ranks 1-2 of k=5
    m = run_one([1, 1, 0, 0, 0], 2, 5)
    np.testing.assert_allclose(m["retrieval_precision"], 2 / 5, rtol=1e-6)
    assert m["retrieval_recall"] == 1.0
    assert m["retrieval_hit_rate"] == 1.0
    assert m["retrieval_reciprocal_rank"] == 1.0
    # AP = mean(1/1, 2/2) = 1
    assert m["retrieval_average_precision"] == 1.0
    # NDCG: dcg = 1/log2(2) + 1/log2(3); idcg same -> 1
    np.testing.assert_allclose(m["retrieval_normalized_dcg"], 1.0, rtol=1e-6)
    # AUROC: every positive precedes every negative -> 1
    assert m["retrieval_auroc"] == 1.0


def test_single_hit_at_rank3():
    m = run_one([0, 0, 1, 0, 0], 4, 5)
    np.testing.assert_allclose(m["retrieval_precision"], 1 / 5, rtol=1e-6)
    np.testing.assert_allclose(m["retrieval_recall"], 1 / 4, rtol=1e-6)
    assert m["retrieval_hit_rate"] == 1.0
    np.testing.assert_allclose(m["retrieval_reciprocal_rank"], 1 / 3)
    np.testing.assert_allclose(m["retrieval_average_precision"], 1 / 3)
    # dcg = 1/log2(4) = 0.5 ; idcg = sum over min(5,4)=4 ideal ones
    idcg = sum(1 / np.log2(i + 2) for i in range(4))
    np.testing.assert_allclose(m["retrieval_normalized_dcg"], 0.5 / idcg, rtol=1e-6)
    # AUROC among k=5: pos at rank 3, negs at 1,2,4,5 -> 2 of 4 correctly after
    np.testing.assert_allclose(m["retrieval_auroc"], 2 / 4)


def test_no_hits():
    m = run_one([0, 0, 0, 0], 3, 4)
    for key in [
        "retrieval_precision",
        "retrieval_recall",
        "retrieval_hit_rate",
        "retrieval_reciprocal_rank",
        "retrieval_average_precision",
        "retrieval_normalized_dcg",
        "retrieval_auroc",
    ]:
        assert m[key] == 0.0, key


def test_interleaved_ap():
    # hits at ranks 1 and 4 of k=4, 2 targets
    m = run_one([1, 0, 0, 1], 2, 4)
    np.testing.assert_allclose(
        m["retrieval_average_precision"], (1 / 1 + 2 / 4) / 2, rtol=1e-6
    )
    # AUROC: pos@1 has 2 negs after, pos@4 has 0; pairs = 2*2
    np.testing.assert_allclose(m["retrieval_auroc"], 2 / 4)


def test_many_targets_limits_idcg():
    # more targets than k: ideal DCG truncated at k
    m = run_one([1, 1, 1], 10, 3)
    idcg = sum(1 / np.log2(i + 2) for i in range(3))
    np.testing.assert_allclose(m["retrieval_normalized_dcg"], 1.0, rtol=1e-6)
    np.testing.assert_allclose(m["retrieval_recall"], 3 / 10)
    assert m["retrieval_auroc"] == 0.0  # all-positive: torchmetrics
    # bails with 0.0 when either class is missing after truncation
    assert idcg > 0


def test_host_api_matches_reference_protocol():
    # recs shorter than top_k are padded with "" (never relevant)
    m = compute_retrieval_metrics(["a", "b"], {"b", "z"}, top_k=4)
    np.testing.assert_allclose(m["retrieval_precision"], 1 / 4, rtol=1e-6)
    np.testing.assert_allclose(m["retrieval_recall"], 1 / 2, rtol=1e-6)
    np.testing.assert_allclose(m["retrieval_reciprocal_rank"], 1 / 2)
    # empty targets -> {}
    assert compute_retrieval_metrics(["a"], set(), top_k=4) == {}


def test_aggregate_skips_empty_target_users():
    rel = jnp.asarray([[1, 0], [0, 0], [1, 1]], jnp.float32)
    n_targets = jnp.asarray([1, 0, 2])  # middle user has no targets
    out = retrieval_metrics(rel, n_targets, 2)
    agg = aggregate_metrics(out)
    # mean over users 0 and 2 only
    np.testing.assert_allclose(float(agg["retrieval_recall"]), (1.0 + 1.0) / 2)
    np.testing.assert_allclose(float(agg["retrieval_precision"]), (0.5 + 1.0) / 2)

"""Encoder-core tests: shapes, masking, causality, pooling, truncation.

Covers the semantics the reference model relies on
(``xfmr_rec/models.py:306-345``): mask = any-nonzero-embedding, truncation
to the last ``max_seq_length`` positions, pooling modes.
"""

import math
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import ModelConfig
from transformer_recommenders_tpu.models.transformer import (
    init_transformer_params,
    pool_tokens,
    transformer_encode,
)

CFG = ModelConfig(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=16,
    max_seq_length=8,
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return init_transformer_params(jax.random.key(0), CFG)


def test_output_shapes(params):
    x = jax.random.normal(jax.random.key(1), (3, 8, 32))
    out = transformer_encode(params, CFG, x)
    assert out["token_embeddings"].shape == (3, 8, 32)
    assert out["sentence_embedding"].shape == (3, 32)
    assert out["attention_mask"].shape == (3, 8)
    assert out["token_embeddings"].dtype == jnp.float32
    assert np.all(np.isfinite(out["sentence_embedding"]))


def test_attention_mask_from_nonzero(params):
    x = np.array(jax.random.normal(jax.random.key(2), (2, 8, 32)))
    x[0, 5:] = 0.0  # padded tail
    out = transformer_encode(params, CFG, jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(out["attention_mask"][0]), [1, 1, 1, 1, 1, 0, 0, 0]
    )
    assert np.all(np.asarray(out["attention_mask"][1]))


def test_causality(params):
    """With is_decoder=True, token t must not see tokens > t."""
    x1 = np.array(jax.random.normal(jax.random.key(3), (1, 8, 32)))
    x2 = x1.copy()
    x2[0, 6:] = np.array(jax.random.normal(jax.random.key(4), (2, 32)))
    o1 = transformer_encode(params, CFG, jnp.asarray(x1))["token_embeddings"]
    o2 = transformer_encode(params, CFG, jnp.asarray(x2))["token_embeddings"]
    np.testing.assert_allclose(
        np.asarray(o1[0, :6]), np.asarray(o2[0, :6]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(o1[0, 6:]), np.asarray(o2[0, 6:]))


def test_non_causal_sees_future(params):
    cfg = CFG.model_copy(update={"is_decoder": False})
    x1 = np.array(jax.random.normal(jax.random.key(5), (1, 8, 32)))
    x2 = x1.copy()
    x2[0, 7] = 3.0
    o1 = transformer_encode(params, cfg, jnp.asarray(x1))["token_embeddings"]
    o2 = transformer_encode(params, cfg, jnp.asarray(x2))["token_embeddings"]
    assert not np.allclose(np.asarray(o1[0, 0]), np.asarray(o2[0, 0]))


def test_padding_does_not_affect_valid_tokens(params):
    """Padded (zero) tail positions must not change valid-token outputs or
    the pooled embedding (they are masked from keys and pooling)."""
    x_short = np.array(jax.random.normal(jax.random.key(6), (1, 4, 32)))
    x_padded = np.zeros((1, 8, 32), np.float32)
    x_padded[0, :4] = x_short[0]
    o1 = transformer_encode(params, CFG, jnp.asarray(x_short))
    o2 = transformer_encode(params, CFG, jnp.asarray(x_padded))
    np.testing.assert_allclose(
        np.asarray(o1["sentence_embedding"]),
        np.asarray(o2["sentence_embedding"]),
        rtol=1e-6,
    )


def test_pooling_modes():
    tok = jnp.asarray(
        [[[1.0, 2.0], [3.0, 4.0], [50.0, 60.0]]]
    )  # (1, 3, 2); last position padded
    mask = jnp.asarray([[True, True, False]])
    np.testing.assert_allclose(np.asarray(pool_tokens(tok, mask, "mean")[0]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(pool_tokens(tok, mask, "max")[0]), [3.0, 4.0])
    np.testing.assert_allclose(np.asarray(pool_tokens(tok, mask, "cls")[0]), [1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(pool_tokens(tok, mask, "lasttoken")[0]), [3.0, 4.0]
    )


def test_normalized_output(params):
    cfg = CFG.model_copy(update={"is_normalized": True})
    x = jax.random.normal(jax.random.key(7), (4, 8, 32))
    out = transformer_encode(params, cfg, x)
    norms = np.linalg.norm(np.asarray(out["sentence_embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_too_long_sequence_raises(params):
    x = jnp.zeros((1, 9, 32))
    with pytest.raises(ValueError, match="max_seq_length"):
        transformer_encode(params, CFG, x)


def test_dropout_deterministic_per_key(params):
    x = jax.random.normal(jax.random.key(8), (2, 8, 32))
    o1 = transformer_encode(params, CFG, x, dropout_rng=jax.random.key(9))
    o2 = transformer_encode(params, CFG, x, dropout_rng=jax.random.key(9))
    o3 = transformer_encode(params, CFG, x, dropout_rng=jax.random.key(10))
    np.testing.assert_allclose(
        np.asarray(o1["token_embeddings"]), np.asarray(o2["token_embeddings"])
    )
    assert not np.allclose(
        np.asarray(o1["token_embeddings"]), np.asarray(o3["token_embeddings"])
    )


def test_input_projection():
    cfg = CFG.model_copy(update={"input_dim": 16})
    params = init_transformer_params(jax.random.key(0), cfg)
    assert "input_proj" in params
    x = jax.random.normal(jax.random.key(11), (2, 8, 16))
    out = transformer_encode(params, cfg, x)
    assert out["sentence_embedding"].shape == (2, 32)


def test_jit_compiles(params):
    fn = jax.jit(lambda p, x: transformer_encode(p, CFG, x)["sentence_embedding"])
    x = jax.random.normal(jax.random.key(12), (2, 8, 32))
    out = fn(params, x)
    assert out.shape == (2, 32)


def test_preprojected_table_equivalence():
    """compute_embeds' pre-projected-table fast path must match projecting
    each gathered row (linearity of the projection)."""
    from transformer_recommenders_tpu.models.recommender import compute_embeds
    from transformer_recommenders_tpu.models.transformer import _dense

    cfg = CFG.model_copy(update={"input_dim": 24})
    params = init_transformer_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    table = np.concatenate(
        [np.zeros((1, 24), np.float32), rng.normal(size=(50, 24)).astype(np.float32)]
    )
    batch = {
        k: jnp.asarray(rng.integers(1, 51, size=(4, 8)).astype(np.int32))
        for k in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
    }
    fast = compute_embeds(
        params, cfg, jnp.asarray(table),
        batch["history_item_idx"], batch["pos_item_idx"], batch["neg_item_idx"],
    )
    # slow path: force table_lookup so no pre-projection happens
    slow = compute_embeds(
        params, cfg, None,
        batch["history_item_idx"], batch["pos_item_idx"], batch["neg_item_idx"],
        table_lookup=lambda idx: jnp.take(jnp.asarray(table), idx, axis=0),
    )
    for key in ["query", "pos_embed", "neg_pool"]:
        np.testing.assert_allclose(
            np.asarray(fast[key]), np.asarray(slow[key]), rtol=2e-5, atol=2e-5
        )
    np.testing.assert_array_equal(
        np.asarray(fast["row_valid"]), np.asarray(slow["row_valid"])
    )


def test_gather_then_project_equivalence():
    """With a catalog LARGER than the 3*B*S gathered rows, compute_embeds
    routes to gather-then-project (frozen table, no scatter backward —
    BASELINE config #4's shape regime).  Outputs AND the input-projection
    gradient must match the pre-projected-table semantics."""
    from transformer_recommenders_tpu.models.recommender import compute_embeds
    from transformer_recommenders_tpu.models.transformer import _dense

    cfg = CFG.model_copy(update={"input_dim": 24})
    params = init_transformer_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    n_items = 120  # > 3 * 4 * 8 = 96 gathered rows -> new branch
    table = jnp.asarray(np.concatenate(
        [np.zeros((1, 24), np.float32),
         rng.normal(size=(n_items, 24)).astype(np.float32)]
    ))
    batch = {
        k: jnp.asarray(rng.integers(0, n_items + 1, size=(4, 8)).astype(np.int32))
        for k in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
    }

    def run(params, force_pre: bool):
        if force_pre:
            dtype = jnp.dtype(cfg.compute_dtype)
            tp = _dense(table, params["input_proj"], dtype).at[0].set(0.0)
            return compute_embeds(
                params, cfg, None, *batch.values(),
                table_lookup=lambda idx: jnp.take(tp, idx, axis=0),
                lookup_projected=True,
            )
        return compute_embeds(params, cfg, table, *batch.values())

    auto = run(params, force_pre=False)
    pre = run(params, force_pre=True)
    for key in ["query", "pos_embed", "neg_pool"]:
        np.testing.assert_allclose(
            np.asarray(auto[key]), np.asarray(pre[key]), rtol=2e-5, atol=2e-5
        )
    for key in ["row_valid", "neg_valid", "attention_mask"]:
        np.testing.assert_array_equal(np.asarray(auto[key]), np.asarray(pre[key]))

    def loss(p, force_pre):
        e = run(p, force_pre)
        q = e["query"] * e["row_valid"][:, None]
        return (
            jnp.sum(q * e["pos_embed"]) + jnp.sum(jnp.square(e["neg_pool"]))
        )

    g_auto = jax.grad(lambda p: loss(p, False))(params)["input_proj"]
    g_pre = jax.grad(lambda p: loss(p, True))(params)["input_proj"]
    np.testing.assert_allclose(
        np.asarray(g_auto["w"]), np.asarray(g_pre["w"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_auto["b"]), np.asarray(g_pre["b"]), rtol=1e-4, atol=1e-5
    )


def test_ml25m_scale_model_shape():
    """The scale config (6 layers, d=256, seq 128 — configs/ml25m_ccl.yaml)
    instantiates and runs forward."""
    cfg = ModelConfig(
        input_dim=384,
        hidden_size=256,
        num_hidden_layers=6,
        num_attention_heads=8,
        intermediate_size=1024,
        max_seq_length=128,
        compute_dtype="float32",
    )
    params = init_transformer_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 128, 384))
    out = transformer_encode(params, cfg, x)
    assert out["sentence_embedding"].shape == (2, 256)
    assert np.isfinite(np.asarray(out["sentence_embedding"])).all()


# -- hash dropout distribution ------------------------------------------------
# _dropout replaced jax.random.bernoulli with a counter-based murmur3-fmix32
# hash (perf: the threefry bit tensor round-tripped HBM).  These tests pin the
# statistical contract the swap must preserve.


def test_hash_dropout_keep_rate_and_scaling():
    from transformer_recommenders_tpu.models.transformer import _dropout

    rate = 0.1
    x = jnp.ones((64, 64, 64))  # 262144 elements
    out = np.asarray(_dropout(x, rate, jax.random.key(3)))
    kept = out != 0.0
    n = x.size
    keep_rate = kept.mean()
    # binomial 5-sigma bound around 1-rate
    sigma = math.sqrt(rate * (1 - rate) / n)
    assert abs(keep_rate - (1 - rate)) < 5 * sigma, keep_rate
    # inverted-dropout scaling on survivors
    np.testing.assert_allclose(out[kept], 1.0 / (1 - rate), rtol=1e-6)


def test_hash_dropout_rate_sweep():
    from transformer_recommenders_tpu.models.transformer import _dropout

    x = jnp.ones((512, 512))
    for rate in (0.02, 0.3, 0.5, 0.9):
        kept = np.asarray(_dropout(x, rate, jax.random.key(11))) != 0.0
        sigma = math.sqrt(rate * (1 - rate) / x.size)
        assert abs(kept.mean() - (1 - rate)) < 5 * sigma, (rate, kept.mean())


def test_hash_dropout_masks_independent_across_keys():
    from transformer_recommenders_tpu.models.transformer import _dropout

    rate = 0.5
    x = jnp.ones((512, 512))
    m1 = np.asarray(_dropout(x, rate, jax.random.key(1))) != 0.0
    m2 = np.asarray(_dropout(x, rate, jax.random.key(2))) != 0.0
    assert (m1 != m2).any()
    # independence: P(both kept) ~ keep^2; 5-sigma binomial bound
    both = (m1 & m2).mean()
    p = (1 - rate) ** 2
    sigma = math.sqrt(p * (1 - p) / x.size)
    assert abs(both - p) < 5 * sigma, both
    # split keys (the per-site keys inside transformer_encode) also decorrelate
    k1, k2 = jax.random.split(jax.random.key(0))
    m1 = np.asarray(_dropout(x, rate, k1)) != 0.0
    m2 = np.asarray(_dropout(x, rate, k2)) != 0.0
    both = (m1 & m2).mean()
    assert abs(both - p) < 5 * sigma, both


def test_hash_dropout_no_positional_structure():
    """Keep rate must hold per row AND per column (no stuck lanes from the
    linear-index construction)."""
    from transformer_recommenders_tpu.models.transformer import _dropout

    rate = 0.5
    x = jnp.ones((256, 256))
    kept = (np.asarray(_dropout(x, rate, jax.random.key(7))) != 0.0).astype(np.float64)
    sigma = math.sqrt(rate * (1 - rate) / 256)
    for axis in (0, 1):
        marginal = kept.mean(axis=axis)
        assert (np.abs(marginal - (1 - rate)) < 6 * sigma).all(), marginal.min()


def test_hash_dropout_identity_cases():
    from transformer_recommenders_tpu.models.transformer import _dropout

    x = jax.random.normal(jax.random.key(0), (8, 8))
    np.testing.assert_array_equal(np.asarray(_dropout(x, 0.0, jax.random.key(1))), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(_dropout(x, 0.5, None)), np.asarray(x))


def test_attn_core_bf16_single_residual_matches_unfused():
    """The single-residual attention chain (s>64 XLA path, bf16 compute)
    must be bit-identical to the unfused qk->softmax->bf16->dropout->pv
    chain in the forward and close in every gradient (the VJP rebuilds the
    dropped probs from the one saved bf16 buffer + the recomputed hash
    mask, and runs every backward matmul with bf16 operands)."""
    import math as _math

    from transformer_recommenders_tpu.models.transformer import (
        _attn_bias,
        _attn_core_bf16,
        _dropout_from_seed,
    )

    b, s, h, dh = 2, 16, 4, 8
    q = (jax.random.normal(jax.random.key(0), (b, s, h, dh)) * 2.0).astype(
        jnp.bfloat16
    )
    k = jax.random.normal(jax.random.key(3), (b, s, h, dh)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.key(1), (b, s, h, dh)).astype(jnp.bfloat16)
    key_mask = jnp.arange(s)[None, :] < jnp.array([[s], [s - 3]])[:, 0:1]
    seed = jnp.uint32(1234)

    def unfused(q, k, v, rate, causal):
        scores = (
            jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
            / _math.sqrt(dh)
            + _attn_bias(key_mask, s, causal)
        )
        y = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        p = _dropout_from_seed(y, rate, seed) if rate > 0 else y
        return jnp.einsum(
            "bhst,bthd->bshd", p, v, preferred_element_type=jnp.float32
        )

    for rate in (0.0, 0.1):
        for causal in (False, True):
            got = _attn_core_bf16(q, k, v, key_mask, seed, rate, causal)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(unfused(q, k, v, rate, causal))
            )
            g = jax.random.normal(jax.random.key(2), got.shape)
            ref_grads = jax.vjp(
                lambda q, k, v: unfused(q, k, v, rate, causal), q, k, v
            )[1](g)
            got_grads = jax.vjp(
                lambda q, k, v: _attn_core_bf16(
                    q, k, v, key_mask, seed, rate, causal
                ),
                q, k, v,
            )[1](g)
            # probs rebuild from bf16-rounded y + bf16 ds/g operands:
            # error ~ 2^-8 relative on O(1) gradients
            for got_d, ref_d in zip(got_grads, ref_grads):
                np.testing.assert_allclose(
                    np.asarray(got_d, np.float32),
                    np.asarray(ref_d, np.float32),
                    rtol=0.06, atol=0.06,
                )


def test_split_attention_bf16_grads_match_f32_path():
    """End-to-end check at an s>64 shape: encoder gradients with bf16
    compute (bf16-residual softmax engaged) track the f32 path."""
    cfg32 = ModelConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=32, max_seq_length=80, compute_dtype="float32",
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    cfg16 = cfg32.model_copy(update={"compute_dtype": "bfloat16"})
    params = init_transformer_params(jax.random.key(0), cfg32)
    x = jax.random.normal(jax.random.key(1), (2, 80, 32))

    def loss(p, cfg):
        return jnp.sum(
            jnp.square(transformer_encode(p, cfg, x)["sentence_embedding"])
        )

    g32 = jax.grad(lambda p: loss(p, cfg32))(params)
    g16 = jax.grad(lambda p: loss(p, cfg16))(params)
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(1.0, float(np.max(np.abs(b))))
        assert np.max(np.abs(a - b)) / denom < 0.05


def test_fast_variance_ln_matches_two_pass():
    """The s>64 fast-variance LN (var = E[x^2] - E[x]^2) must agree with
    the two-pass form to f32 summation-order tolerance, in value and grad."""
    from transformer_recommenders_tpu.models.transformer import _layer_norm

    p = {
        "scale": jnp.asarray(np.linspace(0.5, 1.5, 64, dtype=np.float32)),
        "bias": jnp.asarray(np.linspace(-0.1, 0.1, 64, dtype=np.float32)),
    }
    x = jax.random.normal(jax.random.key(0), (128, 64)) * 3.0 + 1.7

    slow = _layer_norm(x, p, 1e-12)
    fast = _layer_norm(x, p, 1e-12, fast_variance=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=2e-5)

    g_slow = jax.grad(lambda x: jnp.sum(jnp.square(_layer_norm(x, p, 1e-12))))(x)
    g_fast = jax.grad(
        lambda x: jnp.sum(jnp.square(_layer_norm(x, p, 1e-12, fast_variance=True)))
    )(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow), atol=2e-4)

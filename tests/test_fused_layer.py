"""Full-layer megafusion kernel (ops/fused_layer.py) vs the XLA layer
stack in models/transformer.py — forward, gradients, and the bit-identical
dropout-stream guarantee, all in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import ModelConfig
from transformer_recommenders_tpu.models import transformer as T
from transformer_recommenders_tpu.ops.fused_layer import _erf, fused_layer

B, S, D, H, F = 4, 8, 32, 4, 64


def _setup(seed=0, causal=True, dropout=0.0):
    cfg = ModelConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=H,
        intermediate_size=F, max_seq_length=S, compute_dtype="float32",
        hidden_dropout=dropout, attention_dropout=dropout, is_decoder=causal,
    )
    params = T.init_transformer_params(jax.random.key(seed), cfg)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    mask = np.ones((B, S), bool)
    mask[-1, 5:] = False  # a padded tail
    return cfg, layer, x, jnp.asarray(mask)


def _xla_layer(cfg, x, layer, mask, keys=None):
    dtype = jnp.dtype(cfg.compute_dtype)
    r1, r2, r3 = keys if keys is not None else (None, None, None)
    attn = T._attention(x, layer, cfg, mask, r1)
    attn = T._dropout(attn, cfg.hidden_dropout, r2)
    h = T._layer_norm(x + attn, layer["ln1"], cfg.layer_norm_eps, dtype)
    ffn = T._ffn(h, layer, cfg)
    ffn = T._dropout(ffn, cfg.hidden_dropout, r3)
    return T._layer_norm(h + ffn, layer["ln2"], cfg.layer_norm_eps, dtype)


def _fused(cfg, x, layer, mask, seeds=None):
    return fused_layer(
        x, layer, mask, num_heads=cfg.num_attention_heads,
        causal=cfg.is_decoder,
        attn_dropout=cfg.attention_dropout if seeds is not None else 0.0,
        hidden_dropout=cfg.hidden_dropout if seeds is not None else 0.0,
        dropout_seeds=seeds, ffn_dim=cfg.intermediate_size,
        layer_norm_eps=cfg.layer_norm_eps, interpret=True,
    )


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_xla(causal):
    cfg, layer, x, mask = _setup(causal=causal)
    ref = _xla_layer(cfg, x, layer, mask)
    out = _fused(cfg, x, layer, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    ("s", "d", "h", "f"),
    [(16, 128, 4, 256), (8, 256, 8, 128), (32, 64, 2, 96), (8, 128, 8, 48)],
)
def test_forward_matches_xla_other_shapes(s, d, h, f):
    """Shape sweep: head widths 16-64, hidden 64-256, ffn not tied to 4d
    (the TPU gate limits COMPILED use to 128-multiples, but the kernel
    itself must be shape-generic for interpret-mode tests and future
    gates)."""
    cfg = ModelConfig(
        hidden_size=d, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="float32",
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = T.init_transformer_params(jax.random.key(1), cfg)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, s, d)).astype(np.float32))
    mask = np.ones((4, s), bool)
    mask[0, s // 2 :] = False
    mask = jnp.asarray(mask)
    ref = _xla_layer(cfg, x, layer, mask)
    out = fused_layer(
        x, layer, mask, num_heads=h, causal=True, ffn_dim=f,
        layer_norm_eps=cfg.layer_norm_eps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _probe_loss(fn, probe):
    """A loss that actually depends on the layer input: sum(y^2) of an LN
    output is nearly input-invariant (sum of squared normalized values is
    ~constant per row), so probe with a random linear functional instead."""
    return lambda args: jnp.vdot(fn(args[0], args[1]), probe)


def test_gradients_match_xla():
    cfg, layer, x, mask = _setup()
    probe = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, S, D)).astype(np.float32)
    )
    gx_ref, gl_ref = jax.grad(
        _probe_loss(lambda x_, l_: _xla_layer(cfg, x_, l_, mask), probe)
    )((x, layer))
    gx, gl = jax.grad(
        _probe_loss(lambda x_, l_: _fused(cfg, x_, l_, mask), probe)
    )((x, layer))
    assert float(jnp.linalg.norm(gx_ref)) > 1e-2  # non-degenerate
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gl_ref)[0],
        jax.tree_util.tree_flatten_with_path(gl)[0],
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(kp))


def test_dropout_stream_matches_xla_exactly():
    """The kernel evaluates the SAME counter-hash as transformer._dropout
    with the same per-site seeds -> identical output, dropout on."""
    cfg, layer, x, mask = _setup(dropout=0.2)
    keys = list(jax.random.split(jax.random.key(42), 3))
    seeds = T._dropout_site_seeds(jnp.stack(keys))
    ref = _xla_layer(cfg, x, layer, mask, keys=keys)
    out = _fused(cfg, x, layer, mask, seeds=seeds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dropout_grads_match_xla():
    """Gradients with dropout ON: the backward regenerates the same keep
    masks as the XLA path's hash dropout, so the full VJP agrees."""
    cfg, layer, x, mask = _setup(dropout=0.3)
    keys = list(jax.random.split(jax.random.key(42), 3))
    seeds = T._dropout_site_seeds(jnp.stack(keys))
    probe = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, S, D)).astype(np.float32)
    )
    gx_ref, gl_ref = jax.grad(
        _probe_loss(lambda x_, l_: _xla_layer(cfg, x_, l_, mask, keys=keys),
                    probe)
    )((x, layer))
    gx, gl = jax.grad(
        _probe_loss(lambda x_, l_: _fused(cfg, x_, l_, mask, seeds=seeds),
                    probe)
    )((x, layer))
    assert float(jnp.linalg.norm(gx_ref)) > 1e-2
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gl_ref)[0],
        jax.tree_util.tree_flatten_with_path(gl)[0],
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(kp))


def test_multi_layer_encoder_path(monkeypatch):
    """transformer_encode routes through the fused kernel when the gate is
    open and produces the XLA stack's numbers (dropout off)."""
    cfg = ModelConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=8,
        intermediate_size=128, max_seq_length=8, compute_dtype="float32",
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = T.init_transformer_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 128)).astype(np.float32))
    mask = jnp.asarray(np.ones((4, 8), bool))

    ref = T.transformer_encode(params, cfg, x, mask)

    monkeypatch.setattr(T, "_fused_layer_mode", lambda c, s: "interpret")
    out = T.transformer_encode(params, cfg, x, mask)
    np.testing.assert_allclose(
        np.asarray(out["sentence_embedding"]),
        np.asarray(ref["sentence_embedding"]),
        rtol=2e-5, atol=2e-5,
    )


def test_encoder_path_with_dropout_identical(monkeypatch):
    """Same rng -> the fused encoder equals the XLA encoder bit-for-bit
    (f32) even with dropout on, because the site seeds derive identically."""
    cfg = ModelConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=8,
        intermediate_size=128, max_seq_length=8, compute_dtype="float32",
        hidden_dropout=0.15, attention_dropout=0.1,
    )
    params = T.init_transformer_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 128)).astype(np.float32))
    mask = jnp.asarray(np.ones((4, 8), bool))
    key = jax.random.key(11)

    ref = T.transformer_encode(params, cfg, x, mask, dropout_rng=key)
    monkeypatch.setattr(T, "_fused_layer_mode", lambda c, s: "interpret")
    out = T.transformer_encode(params, cfg, x, mask, dropout_rng=key)
    np.testing.assert_allclose(
        np.asarray(out["sentence_embedding"]),
        np.asarray(ref["sentence_embedding"]),
        rtol=2e-5, atol=2e-5,
    )


def test_erf_matches_lax():
    x = jnp.asarray(np.linspace(-6, 6, 20001).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_erf(x)), np.asarray(jax.lax.erf(x)), atol=1e-6
    )


def test_erf_as_within_documented_error():
    """The A&S 7.1.26 rational (backward-recompute erf) is within its
    documented 2.5e-5 absolute error everywhere, including the tails and
    odd symmetry."""
    from transformer_recommenders_tpu.ops.fused_layer import _erf_as

    x = jnp.asarray(np.linspace(-9, 9, 40001).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_erf_as(x)), np.asarray(jax.lax.erf(x)), atol=2.6e-5
    )
    assert float(_erf_as(jnp.float32(30.0))) == 1.0
    assert float(_erf_as(jnp.float32(-30.0))) == -1.0


def test_approx_recompute_erf_grad_shift_is_negligible():
    """bf16 compute dtype routes the BACKWARD recompute's erf through the
    A&S rational; the forward must be unchanged and the gradients must
    move O(1e-5) relative vs the exact-erf backward."""
    from transformer_recommenders_tpu.ops import fused_layer as FL

    s, d, h, f, b = 8, 128, 4, 256, 4
    cfg = ModelConfig(
        hidden_size=d, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="bfloat16",
        hidden_dropout=0.1, attention_dropout=0.1,
    )
    params = T.init_transformer_params(jax.random.key(0), cfg)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    mask = jnp.asarray(np.ones((b, s), bool))
    seeds = T._dropout_site_seeds(jnp.stack(list(jax.random.split(jax.random.key(1), 3))))

    def run(approx: bool):
        old = FL._APPROX_RECOMPUTE_ERF
        FL._APPROX_RECOMPUTE_ERF = approx
        try:
            def loss(args):
                x_, l_ = args
                y = fused_layer(
                    x_, l_, mask, num_heads=h, causal=True, attn_dropout=0.1,
                    hidden_dropout=0.1, dropout_seeds=seeds, ffn_dim=f,
                    layer_norm_eps=cfg.layer_norm_eps, interpret=True,
                )
                return jnp.sum(y.astype(jnp.float32) ** 2)

            y = fused_layer(
                x, layer, mask, num_heads=h, causal=True, attn_dropout=0.1,
                hidden_dropout=0.1, dropout_seeds=seeds, ffn_dim=f,
                layer_norm_eps=cfg.layer_norm_eps, interpret=True,
            )
            gx, gl = jax.grad(loss)((x, layer))
            return y, gx, gl
        finally:
            FL._APPROX_RECOMPUTE_ERF = old

    y_exact, gx_exact, gl_exact = run(False)
    y_approx, gx_approx, gl_approx = run(True)
    # forward path never uses the approximation
    np.testing.assert_array_equal(np.asarray(y_exact), np.asarray(y_approx))
    # gradient shift bounded by the 2.5e-5 erf error propagated once
    np.testing.assert_allclose(
        np.asarray(gx_approx, np.float32), np.asarray(gx_exact, np.float32),
        rtol=5e-3, atol=5e-3,
    )
    for (kp, a), (_, b_) in zip(
        jax.tree_util.tree_flatten_with_path(gl_exact)[0],
        jax.tree_util.tree_flatten_with_path(gl_approx)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b_, np.float32), np.asarray(a, np.float32),
            rtol=5e-3, atol=5e-3, err_msg=str(kp),
        )


def test_gate_falls_back_on_unsupported_shapes(monkeypatch):
    # the reference's ffn=48 IS supported (in-kernel zero-padding to 128):
    # gate opens on a TPU backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = ModelConfig(
        hidden_size=128, num_hidden_layers=1, num_attention_heads=8,
        intermediate_size=48, max_seq_length=8,
    )
    assert T._fused_layer_mode(cfg, 8) == "compiled"
    cfg2 = ModelConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=8,
        intermediate_size=128, max_seq_length=8,
    )
    assert T._fused_layer_mode(cfg2, 8) is None  # hidden not 128-multiple
    cfg3 = ModelConfig(
        hidden_size=256, num_hidden_layers=1, num_attention_heads=8,
        intermediate_size=1024, max_seq_length=128,
    )
    # config #4's seq 128: the per-head TALL layout measured 6.90 ms/step
    # vs 6.51 for XLA on v5e (scripts/bench_config4.py, round 3) — the
    # auto gate hands s > 64 to the XLA path
    assert T._fused_layer_mode(cfg3, 128) is None
    cfg4 = ModelConfig(
        hidden_size=256, num_hidden_layers=1, num_attention_heads=8,
        intermediate_size=1024, max_seq_length=256,
    )
    assert T._fused_layer_mode(cfg4, 256) is None


def test_long_sequences_refused_and_gated_to_xla():
    """The per-head tall layout was retired in round 4 (lost to XLA at
    every feasible shape; d=512 can't hold f32 params+grads in VMEM):
    fused_layer must refuse s > 64 loudly and the model gate must route
    those shapes to the XLA stack."""
    s, d, h, f, b = 128, 64, 4, 96, 2
    cfg = ModelConfig(
        hidden_size=d, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="float32",
    )
    params = T.init_transformer_params(jax.random.key(3), cfg)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, s), bool))
    with pytest.raises(ValueError, match="retired"):
        fused_layer(
            x, layer, mask, num_heads=h, causal=True, ffn_dim=f,
            layer_norm_eps=cfg.layer_norm_eps, interpret=True,
        )
    # gate check needs a 128-multiple hidden size: with d=64 the
    # hidden_size % 128 clause short-circuits and the s-gate would be
    # untested (the assertion would pass even if the s > 64 branch were
    # deleted)
    cfg_gate = ModelConfig(
        hidden_size=128, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="float32",
    )
    # mock a non-cpu backend so the backend clause can't mask the s-gate
    from unittest import mock

    with mock.patch.object(T.jax, "default_backend", return_value="tpu"):
        assert T._fused_layer_mode(cfg_gate, 64) == "compiled"  # in-range
        assert T._fused_layer_mode(cfg_gate, s) is None  # s=128 -> retired


def test_multi_group_lane_packing_matches_xla():
    """bt spanning SEVERAL packed groups (g = 128//S < bt): B=8 at S=32
    gives two 4-element groups per block — covers the group loop, the
    packed dropout indexing across groups, and the block-diagonal
    contraction with more than one group."""
    s, d, h, f, b = 32, 64, 4, 64, 8
    cfg = ModelConfig(
        hidden_size=d, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="float32",
        hidden_dropout=0.2, attention_dropout=0.2,
    )
    params = T.init_transformer_params(jax.random.key(2), cfg)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 20:] = False
    mask[-1] = False  # fully padded element inside a packed group
    mask = jnp.asarray(mask)
    keys = list(jax.random.split(jax.random.key(5), 3))
    seeds = T._dropout_site_seeds(jnp.stack(keys))

    ref = _xla_layer(cfg, x, layer, mask, keys=keys)
    out = fused_layer(
        x, layer, mask, num_heads=h, causal=True,
        attn_dropout=0.2, hidden_dropout=0.2, dropout_seeds=seeds,
        ffn_dim=f, layer_norm_eps=cfg.layer_norm_eps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)

    probe = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    gx_ref, gl_ref = jax.grad(
        _probe_loss(lambda x_, l_: _xla_layer(cfg, x_, l_, mask, keys=keys),
                    probe)
    )((x, layer))
    gx, gl = jax.grad(
        _probe_loss(
            lambda x_, l_: fused_layer(
                x_, l_, mask, num_heads=h, causal=True, attn_dropout=0.2,
                hidden_dropout=0.2, dropout_seeds=seeds, ffn_dim=f,
                layer_norm_eps=cfg.layer_norm_eps, interpret=True,
            ),
            probe,
        )
    )((x, layer))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-5)
    for (kp, a), (_, b_) in zip(
        jax.tree_util.tree_flatten_with_path(gl_ref)[0],
        jax.tree_util.tree_flatten_with_path(gl)[0],
    ):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(kp))


@pytest.mark.parametrize(
    ("s", "b", "h"),
    [
        (16, 8, 4),   # ideal g=8, block likely smaller -> g_eff covers <8
        (64, 4, 8),   # g=2
        (16, 2, 2),   # bt < ideal g: g_eff = bt
        (48, 4, 4),   # PARTIAL pack (round-3 verdict #6): g=2, 96/128 lanes
        (24, 8, 4),   # partial pack, g=4, 96/128 lanes
        (40, 4, 4),   # partial pack, g=2 (floor(128/40)=3 rounds to pow2)
    ],
)
def test_packed_group_sizes_grads_match_xla(s, b, h):
    """Lane-packing gradient sweep across group sizes (g = largest power
    of two with g*S <= 128, clamped to the block batch), dropout ON —
    exercises the packed backward's block-diagonal contractions and the
    dropped!=0 keep recovery at g in {2, 4, 8}, the bt < g clamp, and the
    PARTIAL packs (g*S < 128) for S = 48/24/40."""
    d, f = 64, 96
    cfg = ModelConfig(
        hidden_size=d, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="float32",
        hidden_dropout=0.25, attention_dropout=0.25,
    )
    params = T.init_transformer_params(jax.random.key(3), cfg)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, s // 2:] = False
    mask = jnp.asarray(mask)
    keys = list(jax.random.split(jax.random.key(7), 3))
    seeds = T._dropout_site_seeds(jnp.stack(keys))
    probe = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))

    def fused_fn(x_, l_):
        return fused_layer(
            x_, l_, mask, num_heads=h, causal=True,
            attn_dropout=0.25, hidden_dropout=0.25, dropout_seeds=seeds,
            ffn_dim=f, layer_norm_eps=cfg.layer_norm_eps, interpret=True,
        )

    gx_ref, gl_ref = jax.grad(
        _probe_loss(lambda x_, l_: _xla_layer(cfg, x_, l_, mask, keys=keys),
                    probe)
    )((x, layer))
    gx, gl = jax.grad(_probe_loss(fused_fn, probe))((x, layer))
    assert float(jnp.linalg.norm(gx_ref)) > 1e-2
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-5)
    for (kp, a), (_, b_) in zip(
        jax.tree_util.tree_flatten_with_path(gl_ref)[0],
        jax.tree_util.tree_flatten_with_path(gl)[0],
    ):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(kp))

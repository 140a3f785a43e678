"""Weight-level forward parity against the reference's actual model class.

The reference drives HF ``BertModel(is_decoder=True)`` with
``inputs_embeds`` (``xfmr_rec/models.py:93-102,306-345``).  This test loads
OUR parameter pytree into a real HF BertModel (torch CPU) and asserts the
token embeddings match — proving the TPU encoder is the same function, not
merely a similar architecture:

- fused qkv -> q/k/v weight split,
- post-LN residual blocks, exact (erf) GELU, 1/sqrt(head_dim) scaling,
- learned absolute positions + embedding LayerNorm,
- token-type embeddings zeroed (constant-0 input in the reference's
  vocab_size=1 setup),
- causal masking via ``is_decoder`` and padding-key masking.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from transformer_recommenders_tpu.configs import ModelConfig
from transformer_recommenders_tpu.models.transformer import (
    init_transformer_params,
    transformer_encode,
)

D, L, H, F, S = 64, 2, 4, 128, 8


def build_hf_model(params, num_heads: int = H):
    """Load OUR param pytree into a real HF BertModel (shapes inferred from
    the pytree; only the head count must be passed for non-default
    configs).  Weight-level forward parity is proven by the tests below."""
    import numpy as _np

    from transformers.models.bert import BertConfig, BertModel

    seq_len, d = _np.asarray(params["pos_embed"]).shape
    n_layers = _np.asarray(params["layers"]["qkv"]["w"]).shape[0]
    ffn = _np.asarray(params["layers"]["ffn_in"]["w"]).shape[-1]
    config = BertConfig(
        vocab_size=1,
        hidden_size=d,
        num_hidden_layers=n_layers,
        num_attention_heads=num_heads,
        intermediate_size=ffn,
        max_position_embeddings=seq_len,
        is_decoder=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )
    model = BertModel(config)
    sd = model.state_dict()

    def t(x):
        return torch.as_tensor(np.asarray(x, np.float32))

    sd["embeddings.position_embeddings.weight"] = t(params["pos_embed"])
    sd["embeddings.token_type_embeddings.weight"] = torch.zeros(2, d)
    sd["embeddings.word_embeddings.weight"] = torch.zeros(1, d)
    sd["embeddings.LayerNorm.weight"] = t(params["embed_ln"]["scale"])
    sd["embeddings.LayerNorm.bias"] = t(params["embed_ln"]["bias"])
    from transformer_recommenders_tpu.models.transformer import unstack_layer

    for i in range(n_layers):
        layer = unstack_layer(params, i)
        qkv_w = np.asarray(layer["qkv"]["w"])  # (D, 3D): columns q|k|v
        qkv_b = np.asarray(layer["qkv"]["b"])
        p = f"encoder.layer.{i}."
        sd[p + "attention.self.query.weight"] = t(qkv_w[:, :d].T)
        sd[p + "attention.self.query.bias"] = t(qkv_b[:d])
        sd[p + "attention.self.key.weight"] = t(qkv_w[:, d : 2 * d].T)
        sd[p + "attention.self.key.bias"] = t(qkv_b[d : 2 * d])
        sd[p + "attention.self.value.weight"] = t(qkv_w[:, 2 * d :].T)
        sd[p + "attention.self.value.bias"] = t(qkv_b[2 * d :])
        sd[p + "attention.output.dense.weight"] = t(np.asarray(layer["out"]["w"]).T)
        sd[p + "attention.output.dense.bias"] = t(layer["out"]["b"])
        sd[p + "attention.output.LayerNorm.weight"] = t(layer["ln1"]["scale"])
        sd[p + "attention.output.LayerNorm.bias"] = t(layer["ln1"]["bias"])
        sd[p + "intermediate.dense.weight"] = t(np.asarray(layer["ffn_in"]["w"]).T)
        sd[p + "intermediate.dense.bias"] = t(layer["ffn_in"]["b"])
        sd[p + "output.dense.weight"] = t(np.asarray(layer["ffn_out"]["w"]).T)
        sd[p + "output.dense.bias"] = t(layer["ffn_out"]["b"])
        sd[p + "output.LayerNorm.weight"] = t(layer["ln2"]["scale"])
        sd[p + "output.LayerNorm.bias"] = t(layer["ln2"]["bias"])
    model.load_state_dict(sd)
    return model.eval()


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        hidden_size=D,
        num_hidden_layers=L,
        num_attention_heads=H,
        intermediate_size=F,
        max_seq_length=S,
        compute_dtype="float32",
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    params = init_transformer_params(jax.random.key(0), cfg)
    return cfg, params, build_hf_model(params)


def test_forward_matches_hf_bert(setup):
    cfg, params, hf = setup
    x = np.asarray(
        jax.random.normal(jax.random.key(1), (3, S, D)), np.float32
    )
    ours = transformer_encode(params, cfg, jnp.asarray(x))
    with torch.inference_mode():
        theirs = hf(
            inputs_embeds=torch.as_tensor(x),
            attention_mask=torch.ones(3, S, dtype=torch.long),
        ).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(ours["token_embeddings"]),
        theirs.numpy(),
        rtol=2e-4,
        atol=2e-5,
    )


def test_forward_matches_hf_bert_with_padding(setup):
    cfg, params, hf = setup
    x = np.array(jax.random.normal(jax.random.key(2), (2, S, D)), np.float32)
    x[0, 5:] = 0.0  # padded tail -> masked keys
    ours = transformer_encode(params, cfg, jnp.asarray(x))
    mask = torch.ones(2, S, dtype=torch.long)
    mask[0, 5:] = 0
    with torch.inference_mode():
        theirs = hf(
            inputs_embeds=torch.as_tensor(x), attention_mask=mask
        ).last_hidden_state
    # compare only VALID positions (padded query rows differ: HF leaves them
    # attending causally, we do too — but numerical noise there is irrelevant)
    np.testing.assert_allclose(
        np.asarray(ours["token_embeddings"][0, :5]),
        theirs.numpy()[0, :5],
        rtol=2e-4,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours["token_embeddings"][1]),
        theirs.numpy()[1],
        rtol=2e-4,
        atol=2e-5,
    )


def test_mean_pooling_matches_sentence_transformers_convention(setup):
    """Pooled output == mask-weighted mean of HF token embeddings (the
    sentence-transformers Pooling module's formula)."""
    cfg, params, hf = setup
    x = np.array(jax.random.normal(jax.random.key(3), (2, S, D)), np.float32)
    x[1, 6:] = 0.0
    ours = transformer_encode(params, cfg, jnp.asarray(x))
    mask = torch.ones(2, S)
    mask[1, 6:] = 0
    with torch.inference_mode():
        tok = hf(
            inputs_embeds=torch.as_tensor(x),
            attention_mask=mask.to(torch.long),
        ).last_hidden_state
    pooled = (tok * mask[:, :, None]).sum(1) / mask.sum(1, keepdim=True)
    np.testing.assert_allclose(
        np.asarray(ours["sentence_embedding"]), pooled.numpy(), rtol=2e-4, atol=2e-5
    )

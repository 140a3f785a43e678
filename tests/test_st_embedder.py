"""The sentence-transformer embedder branch, executed OFFLINE.

The reference encodes item texts with a frozen pretrained
sentence-transformer at datamodule setup (``xfmr_rec/data.py:849-856``).
That exact branch (``data/embeddings.py::sentence_transformer_embed_texts``)
had never run in this environment: no egress means no
``all-MiniLM-L6-v2`` download (round-4 verdict Missing #3).

``SentenceTransformer`` accepts a LOCAL plain-transformers checkpoint and
wraps it with mean pooling — so a tiny random-init BERT + WordPiece
tokenizer constructed on disk exercises the full branch (tokenizer,
forward, pooling, numpy conversion) with zero network.  The pretrained
WEIGHTS remain egress-blocked; the code path no longer is.
"""

import numpy as np
import pytest

st = pytest.importorskip("sentence_transformers")


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny-bert")
    base = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    pieces = [
        "movie", "comedy", "drama", "action", "genre", "title",
        "##s", "##ing", "##9", "##0",
    ]
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    digits = [str(i) for i in range(10)]
    vocab = list(dict.fromkeys(base + pieces + chars + digits))
    (d / "vocab.txt").write_text("\n".join(vocab))

    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(d)
    torch.manual_seed(0)
    BertModel(
        BertConfig(
            vocab_size=len(vocab),
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
        )
    ).save_pretrained(d)
    return str(d)


def test_st_branch_embeds_texts(tiny_checkpoint):
    from transformer_recommenders_tpu.data.embeddings import embed_item_texts

    texts = [
        '{"title": "Movie 1 (1990)", "genres": ["Comedy"]}',
        '{"title": "Movie 2 (1991)", "genres": ["Drama"]}',
        '{"title": "Movie 3 (1992)", "genres": ["Action"]}',
    ]
    out = embed_item_texts(
        texts, embedder="sentence-transformer", model_name=tiny_checkpoint
    )
    assert out.shape == (3, 32)
    assert out.dtype == np.float32
    assert np.all(np.isfinite(out))
    # frozen + deterministic across calls (the reference relies on this)
    again = embed_item_texts(
        texts, embedder="sentence-transformer", model_name=tiny_checkpoint
    )
    np.testing.assert_array_equal(out, again)
    # different texts embed differently
    assert not np.allclose(out[0], out[1])


def test_datamodule_prep_through_st_branch(tiny_checkpoint, tmp_path):
    """The full reference-equivalent prep path: synthetic raw -> ETL ->
    sentence-transformer item embeddings -> model configure + one forward,
    with the encoder's input_dim taken from the ST model's hidden size."""
    import jax

    from transformer_recommenders_tpu.configs import (
        SeqDataModuleConfig,
        TrainConfig,
    )
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.train_state import (
        init_train_state,
        make_train_step,
    )
    from transformer_recommenders_tpu.models.transformer import (
        init_transformer_params,
    )
    import jax.numpy as jnp

    dm = SeqDataModule(
        SeqDataModuleConfig(
            data_dir=str(tmp_path),
            dataset="synthetic",
            embedder="sentence-transformer",
            pretrained_model_name=tiny_checkpoint,
            max_seq_length=8,
            batch_size=8,
            synthetic_num_users=30,
            synthetic_num_items=40,
            synthetic_num_events=1500,
        )
    )
    dm.prepare_data()
    dm.setup()
    assert dm.item_embeddings.shape == (40, 32)

    cfg = TrainConfig(
        input_dim=32,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=16,
        max_seq_length=8,
        compute_dtype="float32",
        train_loss="InfoNCELoss",
    )
    params = init_transformer_params(jax.random.key(0), cfg)
    state = init_train_state(cfg, params)
    table = jnp.asarray(
        np.concatenate(
            [np.zeros((1, 32), np.float32), dm.item_embeddings.astype(np.float32)]
        )
    )
    step = make_train_step(cfg)
    batch = next(iter(dm.train_batches(0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, logs = step(state, table, batch, jax.random.key(1))
    assert np.isfinite(float(logs[f"loss/{cfg.train_loss}"]))

"""Sequential recommender model: frozen item table + causal encoder.

Parity: ``xfmr_rec/models.py:176-419`` (``RecommenderModel``).  The frozen
item-embedding table (with a zero padding row at index 0, reference
models.py:247-253) is a device array kept OUTSIDE the trainable parameter
pytree, so optimizers and checkpoints never touch it (the reference likewise
pops it from checkpoints, ``xfmr_rec/trainer.py:352-362``).  All hot paths
are module-level pure functions that jit cleanly; the class is a thin host
wrapper holding config, params, the table and the id<->idx mapping.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from transformer_recommenders_tpu.configs import ModelConfig
from transformer_recommenders_tpu.models.transformer import (
    Params,
    init_transformer_params,
    transformer_encode,
)


def model_forward(
    params: Params,
    cfg: ModelConfig,
    item_table: jax.Array | None,
    item_idx: jax.Array | None = None,
    *,
    item_embeds: jax.Array | None = None,
    dropout_rng: jax.Array | None = None,
    table_lookup=None,
    inputs_projected: bool = False,
) -> dict[str, jax.Array]:
    """Forward pass from item indices or raw item embeddings.

    Parity: ``xfmr_rec/models.py:306-345`` — truncate to the LAST
    ``max_seq_length`` positions, derive the attention mask as "any nonzero
    embedding component", run the encoder.

    ``table_lookup`` overrides the dense ``jnp.take`` gather — the parallel
    layer passes the model-axis collective lookup for row-sharded tables
    (``parallel/embedding.py``).
    """
    lookup = table_lookup or (
        lambda idx: fast_table_lookup(item_table, idx, compute_dtype=cfg.compute_dtype)
    )
    if item_embeds is not None:
        input_embeds = item_embeds[:, -cfg.max_seq_length :, :]
    elif item_idx is not None:
        input_embeds = lookup(item_idx[:, -cfg.max_seq_length :])
    else:
        msg = "either `item_idx` or `item_embeds` must be provided"
        raise ValueError(msg)
    return transformer_encode(
        params,
        cfg,
        input_embeds,
        dropout_rng=dropout_rng,
        inputs_projected=inputs_projected,
    )


def compute_embeds(
    params: Params,
    cfg: ModelConfig,
    item_table: jax.Array | None,
    history_item_idx: jax.Array,
    pos_item_idx: jax.Array,
    neg_item_idx: jax.Array,
    *,
    dropout_rng: jax.Array | None = None,
    table_lookup=None,
    lookup_projected: bool = False,
) -> dict[str, jax.Array]:
    """Produce per-position training queries and the shared candidate pool.

    Parity: ``xfmr_rec/models.py:366-419`` (``compute_embeds``) — but with
    TPU-friendly FIXED shapes.  The reference boolean-indexes away invalid
    positions (variable shapes); here every (batch x seq) position is kept
    and validity is carried in masks:

    - ``row_valid``:  attention-valid AND sampled positive is not padding
      (reference filters rows via ``attention_mask`` then ``pos_mask``,
      models.py:392,412-418);
    - ``neg_valid``:  attention-valid (the reference's shared negative pool
      is built from attention-valid positions only, models.py:404-408).

    The shared in-batch negative pool is NOT materialized as the reference's
    ``(R, R, D)`` expand; losses consume ``query/pos_embed/neg_pool`` and
    compute ``(R, R)`` logits with a single MXU matmul.

    Returns fixed-shape arrays with R = batch*seq flattened rows:
      ``query`` (R, D) f32, ``pos_embed`` (R, D), ``neg_pool`` (R, D),
      ``row_valid`` (R,) bool, ``neg_valid`` (R,) bool,
      ``attention_mask`` (B, S) bool, ``positive_mask`` (B, S) bool.
    """
    # Pre-project the table ONCE when a learned projection exists: gathers
    # then move 3x fewer bytes (hidden_size vs input_dim rows) and the
    # projection runs over N catalog rows instead of 3*B*S gathered rows.
    # Algebraically identical (the projection is linear); the pad row is
    # re-zeroed so the any-nonzero attention-mask rule still holds.
    s_max = cfg.max_seq_length
    hist_t = history_item_idx[:, -s_max:]
    b, s = hist_t.shape
    pos_flat = pos_item_idx[:, -s:].reshape(b * s)
    neg_flat = neg_item_idx[:, -s:].reshape(b * s)

    projected = lookup_projected
    if table_lookup is None and item_table is not None:
        # ONE fused lookup for history + positives + negatives (3*B*S rows)
        all_idx = jnp.concatenate(
            [hist_t.reshape(-1), pos_flat, neg_flat]
        )
        if "input_proj" in params and item_table.shape[0] > all_idx.size:
            # GATHER-THEN-PROJECT (scale catalogs, BASELINE config #4):
            # when the catalog exceeds the 3*B*S gathered rows, projecting
            # the whole table costs more FLOPs AND more HBM than projecting
            # only the gathered rows — and because the table is FROZEN
            # (never updated, ``xfmr_rec/trainer.py:352-362``) the backward
            # here is just dW = gathered^T @ d_out, where pre-projection's
            # backward must SCATTER 3R row-grads into a dense (N+1, D) f32
            # d(projected_table) and re-read the f32 table for dW.  Cost
            # model + measured crossover: scripts/roofline_config4.py and
            # BENCH_CONFIG4.json.  Algebraically identical to pre-projection
            # (the projection is linear and per-row); pad rows are re-zeroed
            # because the projection bias would otherwise make them nonzero.
            from transformer_recommenders_tpu.models.transformer import _dense

            raw = fast_table_lookup(
                item_table, all_idx, compute_dtype=cfg.compute_dtype
            )
            rows = _dense(raw, params["input_proj"], jnp.dtype(cfg.compute_dtype))
            rows = rows * (all_idx != 0)[:, None].astype(rows.dtype)
            projected = True
        else:
            table_use = item_table
            if "input_proj" in params:
                from transformer_recommenders_tpu.models.transformer import _dense

                table_use = _dense(
                    item_table, params["input_proj"], jnp.dtype(cfg.compute_dtype)
                )
                table_use = table_use.at[0].set(0.0)
                projected = True
            rows = fast_table_lookup(
                table_use, all_idx, compute_dtype=cfg.compute_dtype
            )
        r = b * s
        hist_embeds = rows[:r].reshape(b, s, -1)
        pos_embed = rows[r : 2 * r]
        neg_pool = rows[2 * r :]
        out = model_forward(
            params,
            cfg,
            None,
            item_embeds=hist_embeds,
            dropout_rng=dropout_rng,
            inputs_projected=projected,
        )
    else:
        lookup = table_lookup
        out = model_forward(
            params,
            cfg,
            item_table,
            hist_t,
            dropout_rng=dropout_rng,
            table_lookup=lookup,
            inputs_projected=projected,
        )
        pos_embed = lookup(pos_flat)
        neg_pool = lookup(neg_flat)
        if "input_proj" in params and not projected:
            # with a learned projection (input_dim != hidden_size, BASELINE
            # config #3) candidates must be scored in the SAME hidden space
            # as the queries — apply the shared projection to them too
            from transformer_recommenders_tpu.models.transformer import _dense

            dtype = jnp.dtype(cfg.compute_dtype)
            pos_embed = _dense(pos_embed, params["input_proj"], dtype)
            neg_pool = _dense(neg_pool, params["input_proj"], dtype)

    attention_mask = out["attention_mask"]  # (B, S)

    query = out["token_embeddings"].reshape(b * s, -1)
    if cfg.is_normalized:
        query = query / jnp.clip(
            jnp.linalg.norm(query, axis=-1, keepdims=True), min=1e-12
        )

    neg_valid = attention_mask.reshape(b * s)
    positive_mask = (pos_flat != 0) & neg_valid

    return {
        "query": query,
        "pos_embed": pos_embed,
        "neg_pool": neg_pool,
        "row_valid": positive_mask,
        "neg_valid": neg_valid,
        "attention_mask": attention_mask,
        "positive_mask": positive_mask.reshape(b, s),
    }


def compute_query_embeds(
    params: Params,
    cfg: ModelConfig,
    item_table: jax.Array,
    history_item_idx: jax.Array,
    pos_item_idx: jax.Array,
    neg_item_idx: jax.Array,
    *,
    dropout_rng: jax.Array | None = None,
    table_projected: bool = False,
) -> dict[str, jax.Array]:
    """:func:`compute_embeds` WITHOUT gathering candidate rows.

    For table-scored losses (``ops/fused_table_infonce.py``): only history
    rows are looked up (they feed the encoder); positives/negatives stay as
    INDEX vectors scored against the returned query-space ``table`` inside
    the loss kernel — the pos/neg gathers and their scatter backward never
    exist.  Same masks/semantics as :func:`compute_embeds`.

    ``table_projected=True`` marks ``item_table`` as already in query space
    (the sharded trainer projects each table shard locally and all-gathers
    the result over the model axis, so ``input_proj``'s gradient flows
    through the shard-local projection).
    """
    s_max = cfg.max_seq_length
    hist_t = history_item_idx[:, -s_max:]
    b, s = hist_t.shape
    pos_flat = pos_item_idx[:, -s:].reshape(b * s)
    neg_flat = neg_item_idx[:, -s:].reshape(b * s)

    table_use = item_table
    projected = table_projected
    if "input_proj" in params and not table_projected:
        from transformer_recommenders_tpu.models.transformer import _dense

        table_use = _dense(
            item_table, params["input_proj"], jnp.dtype(cfg.compute_dtype)
        )
        table_use = table_use.at[0].set(0.0)
        projected = True
    hist_rows = fast_table_lookup(
        table_use, hist_t.reshape(-1), compute_dtype=cfg.compute_dtype
    )
    out = model_forward(
        params,
        cfg,
        None,
        item_embeds=hist_rows.reshape(b, s, -1),
        dropout_rng=dropout_rng,
        inputs_projected=projected,
    )
    query = out["token_embeddings"].reshape(b * s, -1)
    if cfg.is_normalized:
        query = query / jnp.clip(
            jnp.linalg.norm(query, axis=-1, keepdims=True), min=1e-12
        )
    attention_mask = out["attention_mask"]
    neg_valid = attention_mask.reshape(b * s)
    positive_mask = (pos_flat != 0) & neg_valid
    return {
        "query": query,
        "table": table_use,
        "pos_idx": pos_flat,
        "neg_idx": neg_flat,
        "row_valid": positive_mask,
        "neg_valid": neg_valid,
        "attention_mask": attention_mask,
        "positive_mask": positive_mask.reshape(b, s),
    }


# catalogs up to this size use one-hot MXU-matmul lookups on TPU: XLA's row
# gather costs ~O(rows) dispatches (~0.5 ms per 8k-row gather on v5e) while
# the equivalent one-hot matmul is one MXU pass.  Larger catalogs fall back
# to jnp.take (the one-hot operand would dominate HBM traffic).
ONEHOT_LOOKUP_MAX_ITEMS = 16384


def fast_table_lookup(
    table: jax.Array, idx: jax.Array, *, compute_dtype: jnp.dtype
) -> jax.Array:
    """Embedding lookup tuned for TPU.

    In bf16 compute mode with a moderate catalog the gather becomes a
    one-hot (rows, N) bf16 matmul against the table — exact up to the bf16
    rounding the downstream matmuls apply anyway (one-hot rows select a
    single table row; f32 accumulation copies it exactly).  Otherwise a
    plain ``jnp.take`` (exact f32).
    """
    n = table.shape[0]
    if (
        jnp.dtype(compute_dtype) == jnp.bfloat16
        and n <= ONEHOT_LOOKUP_MAX_ITEMS
        and jax.default_backend() != "cpu"
    ):
        from transformer_recommenders_tpu.ops.gather_matmul import gather_rows

        # bf16 out is lossless here (rows are bf16-rounded table values) and
        # halves the lookup's HBM write + the consumer's read
        rows = gather_rows(table, idx.reshape(-1), out_dtype=jnp.bfloat16)
        return rows.reshape(*idx.shape, table.shape[1])
    return jnp.take(table, idx, axis=0)


def retrieval_item_embeddings(
    params: Params, cfg: ModelConfig, item_table: jax.Array
) -> jax.Array:
    """Catalog matrix in the QUERY (hidden) space, pad row excluded.

    With a learned input projection (input_dim != hidden_size) training
    scores queries against PROJECTED candidates, so retrieval must rank
    against the projected table too; without one it is the raw frozen
    table (reference behavior, where hidden == embedding dim).
    """
    items = item_table[1:]
    if "input_proj" in params:
        from transformer_recommenders_tpu.models.transformer import _dense

        items = _dense(items, params["input_proj"], jnp.dtype(cfg.compute_dtype))
    return items.astype(jnp.float32)


def build_item_table(embeddings: np.ndarray | jax.Array) -> jax.Array:
    """Frozen item table with a zero row prepended as padding index 0.

    Parity: ``xfmr_rec/models.py:247-253``.
    """
    emb = jnp.asarray(embeddings, jnp.float32)
    return jnp.concatenate([jnp.zeros_like(emb[:1]), emb], axis=0)


class RecommenderModel:
    """Host-side convenience wrapper (config + params + table + id maps).

    Parity surface: ``forward`` / ``encode`` / ``compute_embeds`` /
    ``configure_embeddings`` / ``save`` / ``load``
    (``xfmr_rec/models.py:176-419``).
    """

    def __init__(
        self,
        config: ModelConfig,
        *,
        params: Params | None = None,
        rng: jax.Array | None = None,
    ) -> None:
        self.config = ModelConfig.model_validate(config)
        if params is None:
            rng = rng if rng is not None else jax.random.key(0)
            params = init_transformer_params(rng, self.config)
        self.params = params
        self.item_table: jax.Array | None = None
        self.id2idx: dict[str, int] | None = None
        self.item_ids: list[str] | None = None
        # jitted forward closures (shape-polymorphic via jit's shape cache);
        # eager dispatch is slow everywhere and pathological over tunneled
        # chips, so the serving/encode hot paths must never run op-by-op
        cfg = self.config
        self._jit_forward_idx = jax.jit(
            lambda params, table, idx: model_forward(params, cfg, table, idx)
        )
        self._jit_forward_embeds = jax.jit(
            lambda params, embeds: model_forward(params, cfg, None, item_embeds=embeds)
        )

    @property
    def max_seq_length(self) -> int:
        return self.config.max_seq_length

    def configure_embeddings(
        self, item_ids: list[str], embeddings: np.ndarray
    ) -> None:
        """Install the frozen item table and id->idx map (idx 0 = padding).

        Parity: ``xfmr_rec/models.py:234-259``.
        """
        if self.item_table is None:
            self.item_table = build_item_table(embeddings)
        if self.id2idx is None:
            self.item_ids = list(item_ids)
            self.id2idx = {item_id: i + 1 for i, item_id in enumerate(item_ids)}

    def __call__(
        self,
        item_idx: jax.Array | np.ndarray | None = None,
        *,
        item_embeds: jax.Array | np.ndarray | None = None,
        dropout_rng: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        if dropout_rng is not None:  # training-mode calls stay un-jitted here
            return model_forward(
                self.params,
                self.config,
                self.item_table,
                jnp.asarray(item_idx) if item_idx is not None else None,
                item_embeds=jnp.asarray(item_embeds) if item_embeds is not None else None,
                dropout_rng=dropout_rng,
            )
        if item_idx is not None:
            assert self.item_table is not None, "call configure_embeddings first"
            return self._jit_forward_idx(
                self.params, self.item_table, jnp.asarray(item_idx)
            )
        return self._jit_forward_embeds(self.params, jnp.asarray(item_embeds))

    def encode(self, item_ids: list[str]) -> jax.Array:
        """Encode an item-id sequence to its pooled embedding, silently
        dropping unknown ids.  Parity: ``xfmr_rec/models.py:347-364``."""
        assert self.id2idx is not None, "call configure_embeddings first"
        idx = [self.id2idx[i] for i in item_ids if i in self.id2idx]
        idx = idx[-self.max_seq_length :]
        # fixed (1, max_seq) shape (zero-padded tail) so the jitted forward
        # compiles once, not once per history length
        arr = np.zeros((1, self.max_seq_length), np.int32)
        arr[0, : len(idx)] = idx
        return self(jnp.asarray(arr))["sentence_embedding"][0]

    def compute_embeds(
        self,
        history_item_idx: jax.Array,
        pos_item_idx: jax.Array,
        neg_item_idx: jax.Array,
        *,
        dropout_rng: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        assert self.item_table is not None, "call configure_embeddings first"
        return compute_embeds(
            self.params,
            self.config,
            self.item_table,
            jnp.asarray(history_item_idx),
            jnp.asarray(pos_item_idx),
            jnp.asarray(neg_item_idx),
            dropout_rng=dropout_rng,
        )

    # -- persistence ---------------------------------------------------------
    # Parity: the reference saves a SentenceTransformer dir and reconstructs
    # the config from it (models.py:261-304).  Here: config.json + params.npz.
    # The frozen item table is intentionally NOT saved (reference
    # trainer.py:352-362); it is reconstituted from the items dataset.

    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        (path / "config.json").write_text(self.config.model_dump_json(indent=2))
        flat = jax.tree.leaves(self.params)
        np.savez(
            path / "params.npz",
            **{f"p{i}": np.asarray(leaf) for i, leaf in enumerate(flat)},
        )

    @classmethod
    def load(cls, path: str | pathlib.Path) -> RecommenderModel:
        path = pathlib.Path(path)
        config = ModelConfig.model_validate_json((path / "config.json").read_text())
        # the param-tree structure is a pure function of the config, so a
        # template init gives the treedef to unflatten the saved leaves into
        template = init_transformer_params(jax.random.key(0), config)
        treedef = jax.tree.structure(template)
        with np.load(path / "params.npz") as data:
            leaves = [jnp.asarray(data[f"p{i}"]) for i in range(len(data.files))]
        return cls(config, params=jax.tree.unflatten(treedef, leaves))

"""Pydantic config surface for every subsystem.

Parity: the reference spreads configs over ``xfmr_rec/models.py:22-48``
(ModelConfig), ``xfmr_rec/losses.py:11-30`` (LossConfig),
``xfmr_rec/data.py:543-555`` (SeqDataConfig/SeqDataModuleConfig),
``xfmr_rec/index.py:23-47`` (IndexConfig/LanceIndexConfig) and
``xfmr_rec/trainer.py:98-115`` (LightningConfig, a flattening
multi-inherit of Loss+Model configs).  We keep the same flattened
`TrainConfig` surface plus TPU-specific knobs (mesh shape, dtypes).
"""

from __future__ import annotations

from typing import Literal

import pydantic

from transformer_recommenders_tpu.params import (
    DATA_DIR,
    ITEMS_PARQUET,
    ITEMS_TABLE_NAME,
    PRETRAINED_MODEL_NAME,
    TOP_K,
    USERS_PARQUET,
    USERS_TABLE_NAME,
)

PoolingMode = Literal["mean", "max", "cls", "lasttoken"]
Similarity = Literal["dot", "cosine"]

LossType = Literal[
    "AlignmentLoss",
    "AlignmentContrastiveLoss",
    "ContrastiveLoss",
    "InfoNCELoss",
    "NCELoss",
    "PairwiseHingeLoss",
    "PairwiseLogisticLoss",
]


class ModelConfig(pydantic.BaseModel):
    """Transformer encoder topology.  Parity: ``xfmr_rec/models.py:22-48``.

    Unlike the reference (which infers ``hidden_size`` from a pretrained HF
    model), dimensions are explicit.  ``input_dim`` is the dimensionality of
    the frozen item embeddings; when it differs from ``hidden_size`` a
    learned input projection is inserted (BASELINE.json config #3).
    """

    input_dim: int | None = None  # None -> same as hidden_size
    hidden_size: int = 384
    num_hidden_layers: int = 1
    num_attention_heads: int = 12
    intermediate_size: int = 48
    max_seq_length: int = 32
    is_decoder: bool = True  # causal attention, reference models.py:44
    pooling_mode: PoolingMode = "mean"
    is_normalized: bool = False

    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02

    # TPU-first knobs
    compute_dtype: Literal["bfloat16", "float32"] = "bfloat16"
    # fuse each ENTIRE encoder layer (qkv -> attention -> out -> LN -> FFN
    # -> LN, dropouts included) into one Pallas program with every
    # intermediate VMEM-resident; the backward recomputes from the layer
    # input (ops/fused_layer.py).  The unfused layer stack moves ~50 MB of
    # HBM traffic per layer at the flagship shape — measured 2.6 ms of the
    # 3.1 ms step against a 0.2 ms FLOP bound.  Auto-gated: TPU backend,
    # hidden/intermediate sizes multiples of 128, seq a multiple of 8;
    # falls back to the XLA layer otherwise.  When active it subsumes
    # attention_impl/remat_layers
    use_fused_layer: bool = True
    # NOTE: a standalone fused-attention kernel (use_pallas_attention,
    # round 2) was measured and RETIRED in round 3: it lost to the tuned
    # XLA attention at every benched shape (BASELINE.md attention table);
    # its wide layout lives on inside the fused layer (s <= 64,
    # lane-packed — ops/fused_layer.py; the per-head tall layout was
    # retired in round 4, s > 64 is the XLA stack's)
    # XLA attention formulation.  "split": classic head-split einsum
    # (B,S,H,Dh) — the textbook form, but with Dh < 128 every head split
    # forces lane-splitting relayout copies (traced at ~0.7 ms/step at the
    # flagship size).  "masked": head-masked full-width contraction — per-
    # head scores computed over ALL hidden channels with a per-head channel
    # mask, so every tensor stays (.., 128)-lane-aligned and no relayout
    # exists; costs num_heads x redundant MACs on the underfilled MXU
    # (trivial) and is numerically EXACT (each channel belongs to exactly
    # one head, so recombination is a select, not a sum).  Measured on v5e
    # at the flagship shape: 3.99 -> 3.66 ms/step.  The redundant MACs grow
    # as H*S^2*d though, so at the seq-128 config-#4 shape "masked" LOSES
    # (10.45 vs 8.92 ms encoder fwd+bwd) — "auto" picks masked for
    # seq <= 64 and split above (both crossover measurements in
    # BASELINE.md)
    attention_impl: Literal["auto", "split", "masked"] = "auto"
    # NOTE: attention-core-only remat (jax.checkpoint around scores ->
    # softmax -> dropout -> PV, recomputing the (B,H,S,S) f32 probs in the
    # backward) was measured and rejected: 3.10 -> 3.42 ms/step at the
    # flagship seq-32 shape and a wash (10.45 vs 10.48 ms) at the seq-128
    # config-#4 shape — the probs staging DMAs overlap compute, so the
    # serial recompute never pays
    # jax.checkpoint each encoder layer: recompute in backward instead of
    # saving attention/FFN residuals.  Off by default — measured SLOWER at
    # BOTH benchmark shapes on v5e (flagship seq-32: +25%; config-#4
    # seq-128: 6.54 -> 7.75 ms/step, round 4): the residual-staging DMAs
    # overlap compute (the config-4 xplane shows ~4x DMA overlap), so the
    # serial recompute never pays.  Kept for genuinely memory-CAPACITY-
    # bound configs (very deep / very long sequences)
    remat_layers: bool = False

    pretrained_model_name: str = PRETRAINED_MODEL_NAME

    @property
    def resolved_input_dim(self) -> int:
        return self.input_dim if self.input_dim is not None else self.hidden_size

    @pydantic.model_validator(mode="after")
    def _check(self) -> ModelConfig:
        if self.hidden_size % self.num_attention_heads != 0:
            msg = (
                f"hidden_size={self.hidden_size} not divisible by "
                f"num_attention_heads={self.num_attention_heads}"
            )
            raise ValueError(msg)
        return self


class LossConfig(pydantic.BaseModel):
    """In-batch loss pipeline config.  Parity: ``xfmr_rec/losses.py:11-30``."""

    target_position: Literal["first", "diagonal"] | None = "first"
    mask_false_negatives: bool = True
    num_hard_negatives: int = 0
    scale: float = 1.0
    margin: float = 0.5


class SeqDataConfig(pydantic.BaseModel):
    """Sequence sampling config.  Parity: ``xfmr_rec/data.py:543-545``."""

    max_seq_length: int = 32
    pos_lookahead: int = 0


class SeqDataModuleConfig(SeqDataConfig):
    """Data module config.  Parity: ``xfmr_rec/data.py:548-555``."""

    data_dir: str = DATA_DIR
    dataset: Literal["ml-1m", "ml-100k", "ml-25m", "synthetic"] = "ml-1m"
    items_parquet: str = ITEMS_PARQUET
    users_parquet: str = USERS_PARQUET

    pretrained_model_name: str = PRETRAINED_MODEL_NAME
    embedder: Literal["sentence-transformer", "hash"] = "sentence-transformer"
    embedding_dim: int = 384  # used by the hash embedder

    batch_size: int = 32
    seed: int = 0

    # synthetic generator knobs (tests / benches without network egress)
    synthetic_num_users: int = 200
    synthetic_num_items: int = 500
    synthetic_num_events: int = 20_000


class IndexConfig(pydantic.BaseModel):
    """Retrieval index config.  Parity: ``xfmr_rec/index.py:23-47``
    (LanceIndexConfig: metric/cosine, id/text/embedding columns)."""

    index_path: str = "index_store"
    table_name: str = ITEMS_TABLE_NAME
    id_col: str = "item_id"
    text_col: str = "item_text"
    embedding_col: str | None = "embedding"
    metric: Similarity = "cosine"
    backend: Literal["device", "host"] = "device"
    top_k: int = TOP_K
    # persist BM25 postings at save() even when never queried in-process.
    # The serving artifact's ITEMS table sets this (``search_item_text``
    # routes it, so a cold serving replica must not pay the corpus build
    # inside its first request); tables whose text no API searches (users)
    # leave it off and skip the build+artifact cost entirely.
    persist_fts: bool = False


class MeshConfig(pydantic.BaseModel):
    """Device mesh layout for pjit/shard_map execution.

    The reference has no distributed configuration (SURVEY.md §2.3); this is
    the TPU-native equivalent of Lightning's latent ``strategy: auto``:
    a 2-D ``Mesh((data, model))`` with DP over the batch axis and
    row-sharded embedding tables over the model axis.
    """

    data_axis_size: int = -1  # -1: all devices
    model_axis_size: int = 1


class TrainConfig(LossConfig, ModelConfig):
    """Flattened training config.  Parity: ``xfmr_rec/trainer.py:98-115``."""

    train_loss: LossType = "InfoNCELoss"
    # fuse the in-batch loss into a Pallas kernel (no HBM logit matrix);
    # auto-disabled on CPU backends
    use_fused_loss: bool = True
    # score InfoNCE queries against the count-weighted CATALOG instead of
    # the gathered negative pool when the catalog is small enough
    # (ops/fused_table_infonce.py); exact same objective, no pos/neg
    # gathers or scatter backward.  Auto-gated by table/pool size in
    # training/train_state.py:_table_loss_enabled
    use_table_scored_loss: bool = True
    learning_rate: float = 0.001
    weight_decay: float = 0.01
    # clip gradients by global norm before the optimizer update; None/0
    # disables (parity: Lightning ``gradient_clip_val``, reference
    # ``config.yaml:29``, defaults off)
    gradient_clip_val: float | None = None
    # apply the optimizer only every k micro-batches, accumulating grads
    # (parity: Lightning ``accumulate_grad_batches``, config.yaml:30)
    accumulate_grad_batches: int = 1
    max_epochs: int = 1
    max_steps: int = -1
    max_time_seconds: float = 4 * 3600.0
    early_stopping_patience: int = 3  # Lightning EarlyStopping default
    monitor: str = "val/retrieval_normalized_dcg"
    monitor_mode: Literal["max", "min"] = "max"
    seed: int = 0
    log_every_n_steps: int = 50
    # >0: ALSO run validation every N train steps mid-epoch (parity:
    # Lightning ``val_check_interval``, config.yaml:33); epoch-end
    # validation always runs
    val_check_interval: int = -1
    limit_train_batches: int = -1
    limit_val_batches: int = -1
    limit_test_batches: int = -1  # parity: Lightning limit_test_batches
    limit_predict_batches: int = -1  # parity: Lightning limit_predict_batches
    eval_batch_size: int = 256
    ckpt_dir: str = "checkpoints"
    # "npz": single-host flat leaves.  "orbax": sharded device arrays saved
    # natively — the right backend for multi-host meshes (SURVEY.md §5.4)
    checkpoint_backend: Literal["npz", "orbax"] = "npz"
    # MLflow tracking beside the JSONL/CSV logs (parity: the reference's
    # dual TensorBoard+MLflow loggers with run adoption + config artifact,
    # xfmr_rec/trainer.py:37-82,419-463).  File-store layout readable by
    # `mlflow ui`; adopts MLFLOW_RUN_ID when set.  None dir -> <log_dir>/mlruns
    use_mlflow: bool = True
    mlflow_dir: str | None = None
    mlflow_experiment: str = "transformer-recommenders-tpu"
    # when set, capture a jax.profiler trace of training steps into this dir
    # (view with tensorboard/xprof); SURVEY.md §5.1
    profile_dir: str | None = None
    steps_per_dispatch: int = 1  # >1: lax.scan-ed multi-step dispatch
    # True: write best/last checkpoints to disk every epoch (crash-safe).
    # False: keep the best state as a device reference and write to disk
    # ONCE at fit end — device->host transfers are expensive on tunneled
    # chips (measured 0.3 MB/s download on axon)
    checkpoint_every_epoch: bool = True

    items_config: IndexConfig = IndexConfig(
        table_name=ITEMS_TABLE_NAME,
        id_col="item_id",
        text_col="item_text",
        embedding_col="embedding",
    )
    users_config: IndexConfig = IndexConfig(
        table_name=USERS_TABLE_NAME,
        id_col="user_id",
        text_col="user_text",
        embedding_col=None,
    )
    top_k: int = TOP_K
    mesh: MeshConfig = MeshConfig()


def load_yaml_config(path: str, cls: type[pydantic.BaseModel]) -> pydantic.BaseModel:
    """Load a YAML file into a config model (CLI/YAML override surface,
    parity with the jsonargparse layer of ``xfmr_rec/trainer.py:456-463``)."""
    import yaml

    with open(path) as f:
        payload = yaml.safe_load(f) or {}
    return cls.model_validate(payload)

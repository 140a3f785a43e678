from transformer_recommenders_tpu.models.recommender import RecommenderModel
from transformer_recommenders_tpu.models.transformer import (
    init_transformer_params,
    transformer_encode,
)

__all__ = ["RecommenderModel", "init_transformer_params", "transformer_encode"]

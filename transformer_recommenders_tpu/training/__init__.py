from transformer_recommenders_tpu.training.trainer import Trainer

__all__ = ["Trainer"]

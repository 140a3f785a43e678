from transformer_recommenders_tpu.data.dataset import SeqData
from transformer_recommenders_tpu.data.module import SeqDataModule

__all__ = ["SeqData", "SeqDataModule"]

from transformer_recommenders_tpu.parallel.mesh import create_mesh
from transformer_recommenders_tpu.parallel.embedding import sharded_table_lookup
from transformer_recommenders_tpu.parallel.topk_sharded import sharded_topk

__all__ = ["create_mesh", "sharded_table_lookup", "sharded_topk"]

"""Module constants.

Parity: reference ``xfmr_rec/params.py:1-19`` (dataset URL, parquet paths,
pretrained embedder name, monitored metric, TOP_K, index table names).
"""

# datasets
MOVIELENS_1M_URL = "https://files.grouplens.org/datasets/movielens/ml-1m.zip"
MOVIELENS_100K_URL = "https://files.grouplens.org/datasets/movielens/ml-100k.zip"
MOVIELENS_25M_URL = "https://files.grouplens.org/datasets/movielens/ml-25m.zip"
DATA_DIR = "data"

ITEMS_PARQUET = "data/ml-1m/items.parquet"
USERS_PARQUET = "data/ml-1m/users.parquet"
EVENTS_PARQUET = "data/ml-1m/events.parquet"

# model
PRETRAINED_MODEL_NAME = "sentence-transformers/all-MiniLM-L6-v2"
METRIC = {"name": "val/retrieval_normalized_dcg", "mode": "max"}
TOP_K = 20

# serving / artifacts
ITEMS_TABLE_NAME = "items"
USERS_TABLE_NAME = "users"
INDEX_PATH = "index_store"
TRANSFORMER_PATH = "transformer"
MODEL_NAME = "xfmr_rec_tpu"

# mesh axis names (parallel layer)
DATA_AXIS = "data"
MODEL_AXIS = "model"

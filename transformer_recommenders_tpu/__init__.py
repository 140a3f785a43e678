"""transformer_recommenders_tpu — a TPU-native sequential recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the feature surface of the
yxtay/transformer-recommenders reference (PyTorch/Lightning/BentoML):

- ``data``     host-side ETL (MovieLens), frozen text embeddings, batched
               stateless samplers feeding fixed-shape device batches
- ``models``   pure-functional causal transformer encoder over item-embedding
               sequences (params are plain pytrees; everything jits)
- ``ops``      fused in-batch contrastive losses, retrieval metrics, MIPS top-k
- ``parallel`` device mesh, shardings, row-sharded embedding tables,
               column-sharded retrieval
- ``training`` jit-compiled train/eval loops, checkpointing, early stopping
- ``index``    exact on-device MIPS retrieval index + host metadata store
- ``serving``  ASGI service exposing the reference's 8-API surface

Reference parity map: see SURVEY.md §2 at the repo root; each module's
docstring cites the reference files (path:line) whose behavior it covers.
"""

__version__ = "0.1.0"

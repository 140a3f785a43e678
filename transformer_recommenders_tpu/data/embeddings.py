"""Frozen item-text embeddings.

Parity: the reference encodes ``item_text`` once with a frozen pretrained
sentence-transformer at datamodule setup (``xfmr_rec/data.py:849-856``) and
never updates those vectors.  Two backends here:

- ``sentence-transformer``: same as the reference (requires the HF model to
  be available locally — no egress in CI);
- ``hash``: deterministic feature-hashed embeddings from the JSON text
  (token n-gram hashing -> signed buckets -> L2 norm).  Items sharing
  title/genre tokens get correlated vectors, so the semantic-similarity
  property the model relies on survives without any pretrained weights.
"""

from __future__ import annotations

import hashlib
import json
import re

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9']+")


def _tokens(text: str) -> list[str]:
    try:
        payload = json.loads(text)
        flat: list[str] = []
        for v in payload.values():
            if isinstance(v, list):
                flat += [str(x) for x in v]
            else:
                flat.append(str(v))
        text = " ".join(flat)
    except (json.JSONDecodeError, AttributeError):
        pass
    return _TOKEN_RE.findall(text.lower())


def hash_embed_texts(texts: list[str], dim: int = 384) -> np.ndarray:
    """Deterministic feature-hashing embedder (L2-normalized float32)."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, text in enumerate(texts):
        toks = _tokens(text)
        for tok in toks:
            digest = hashlib.blake2b(tok.encode(), digest_size=8).digest()
            val = int.from_bytes(digest, "little")
            bucket = val % dim
            sign = 1.0 if (val >> 32) & 1 else -1.0
            out[i, bucket] += sign
        if not toks:
            out[i, 0] = 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-12)


def sentence_transformer_embed_texts(
    texts: list[str], model_name: str, batch_size: int = 256
) -> np.ndarray:
    """Reference-equivalent path (``xfmr_rec/data.py:849-856``)."""
    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(model_name)
    return np.asarray(
        model.encode(texts, batch_size=batch_size, show_progress_bar=False),
        np.float32,
    )


def embed_item_texts(
    texts: list[str],
    *,
    embedder: str = "hash",
    dim: int = 384,
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
) -> np.ndarray:
    if embedder == "hash":
        return hash_embed_texts(texts, dim)
    if embedder == "sentence-transformer":
        return sentence_transformer_embed_texts(texts, model_name)
    msg = f"unknown embedder: {embedder}"
    raise ValueError(msg)

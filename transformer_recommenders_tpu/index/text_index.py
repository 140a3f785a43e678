"""Host-side BM25 full-text index over a record text column.

The reference's LanceIndex creates a full-text-search index over the
configured text column at indexing time (``xfmr_rec/index.py:185``,
``create_fts_index(text_col)`` — LanceDB's Tantivy-backed BM25) and
documents itself as an index "for fast vector and text search"
(``xfmr_rec/index.py:52``).  This is the equivalent here: a
dependency-free Okapi BM25 (k1=1.2, b=0.75, the Tantivy/Lucene defaults)
over the same text column, built from the same records and saved inside
the same table artifact.

Text search is deliberately host-side: it is string processing plus a
sparse accumulate over a few posting lists — work the MXU/VPU cannot
accelerate and that would waste a device program.  Postings are stored
CSR-style (one ``indptr`` over terms, flat ``doc_ids``/``tfs`` arrays) so
scoring a query is a handful of vectorized ``np.add.at`` scatters.
"""

from __future__ import annotations

import collections
import hashlib
import json
import pathlib
import re

import numpy as np

# Unicode alphanumerics minus underscore: Tantivy's simple tokenizer
# treats any Unicode alphanumeric as a token char, so "Amélie" must stay
# one token (an ASCII-only class would shred it into junk fragments)
_TOKEN_RE = re.compile(r"[^\W_]+")

# Tantivy/Lucene defaults, which is what the reference's
# ``create_fts_index`` ships with.
K1 = 1.2
B = 0.75


def tokenize(text: str) -> list[str]:
    """Lowercased alphanumeric tokens (the Tantivy ``default`` analyzer's
    simple-tokenizer + lowercase filter, minus stemming)."""
    return _TOKEN_RE.findall(text.lower())


def corpus_fingerprint(texts: list[str]) -> str:
    """Content hash of the corpus, stored in ``fts_meta.json`` and checked
    on load: a doc-count match alone would let a re-indexed corpus of
    identical size silently adopt stale postings."""
    h = hashlib.blake2b(digest_size=16)
    for t in texts:
        h.update(t.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")  # record separator: ["ab",""] != ["a","b"]
    return h.hexdigest()


def texts_for(records, text_col: str) -> list[str]:
    """The corpus a records frame yields for ``text_col`` (empty strings
    when the column is absent) — shared by build and load-validation so
    the fingerprint always hashes exactly what build() would index."""
    if text_col in records.columns:
        return records[text_col].astype(str).tolist()
    return [""] * len(records)


class BM25TextIndex:
    """Okapi BM25 over a fixed corpus; document handles are ROW POSITIONS
    (aligned with ``RecordStore`` rows), not ids — the owning index maps
    positions back to payloads exactly as it does for vector search."""

    def __init__(self, *, k1: float = K1, b: float = B) -> None:
        self.k1 = float(k1)
        self.b = float(b)
        self._terms: list[str] = []
        self._term_pos: dict[str, int] = {}
        self._indptr = np.zeros(1, np.int64)  # (T + 1,) into doc_ids/tfs
        self._doc_ids = np.zeros(0, np.int32)
        self._tfs = np.zeros(0, np.float32)
        self._doc_len = np.zeros(0, np.float32)
        self._avg_len = 1.0
        self._norm = np.zeros(0, np.float32)  # precomputed k1*(1-b+b*dl/avg)
        self._fingerprint = corpus_fingerprint([])

    @property
    def num_docs(self) -> int:
        return len(self._doc_len)

    def build(self, texts: list[str]) -> None:
        self._fingerprint = corpus_fingerprint(texts)
        term_pos: dict[str, int] = {}
        # per-term postings accumulated as parallel lists, then packed CSR
        post_docs: list[list[int]] = []
        post_tfs: list[list[int]] = []
        doc_len = np.zeros(len(texts), np.float32)
        for doc, text in enumerate(texts):
            tokens = tokenize(text)
            doc_len[doc] = len(tokens)
            counts: dict[str, int] = {}
            for tok in tokens:
                counts[tok] = counts.get(tok, 0) + 1
            for tok, tf in counts.items():
                tid = term_pos.get(tok)
                if tid is None:
                    tid = term_pos[tok] = len(post_docs)
                    post_docs.append([])
                    post_tfs.append([])
                post_docs[tid].append(doc)
                post_tfs[tid].append(tf)
        self._term_pos = term_pos
        self._terms = list(term_pos)
        lengths = np.fromiter(
            (len(p) for p in post_docs), np.int64, count=len(post_docs)
        )
        self._indptr = np.concatenate([[0], np.cumsum(lengths)])
        self._doc_ids = np.fromiter(
            (d for p in post_docs for d in p), np.int32, count=int(lengths.sum())
        )
        self._tfs = np.fromiter(
            (t for p in post_tfs for t in p), np.float32, count=int(lengths.sum())
        )
        self._doc_len = doc_len
        # guard the all-empty corpus (e.g. a store without the text column):
        # avg_len 0 would make the length norm 0/0 on every query
        avg = float(doc_len.mean()) if len(texts) else 1.0
        self._avg_len = avg if avg > 0 else 1.0
        self._finalize()

    def _finalize(self) -> None:
        """Precompute the per-document length norm — build-time constant,
        shared by every query."""
        self._norm = (
            self.k1 * (1.0 - self.b + self.b * self._doc_len / self._avg_len)
        ).astype(np.float32)

    def scores(self, text: str) -> np.ndarray:
        """BM25 score of every document against ``text`` (0 for documents
        sharing no term with the query).  Repeated query terms count once
        per occurrence, matching Lucene's per-clause sum — the per-document
        contribution tf*(k1+1)/(tf+norm) is identical for every occurrence,
        so one scatter scaled by the query-term count gives the same result
        at 1x the posting-list work."""
        n = self.num_docs
        scores = np.zeros(n, np.float32)
        if n == 0:
            return scores
        norm = self._norm
        for tok, q_count in collections.Counter(tokenize(text)).items():
            tid = self._term_pos.get(tok)
            if tid is None:
                continue
            lo, hi = self._indptr[tid], self._indptr[tid + 1]
            docs = self._doc_ids[lo:hi]
            tf = self._tfs[lo:hi]
            df = hi - lo
            idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            contrib = q_count * idf * tf * (self.k1 + 1.0) / (tf + norm[docs])
            # docs are unique within one posting list, so plain fancy-index
            # assignment would be safe too; += keeps intent obvious
            scores[docs] += contrib.astype(np.float32)
        return scores

    def search(
        self,
        text: str,
        top_k: int = 20,
        exclude_positions: list[int] | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (row position, score) pairs, zero-score rows dropped —
        matching vector ``search``'s fewer-than-k behavior when the corpus
        has fewer matches than ``top_k``."""
        scores = self.scores(text)
        for pos in exclude_positions or []:
            if 0 <= pos < len(scores):
                scores[pos] = 0.0
        k = min(top_k, len(scores))
        if k <= 0:  # <= catches a client-supplied negative top_k, which
            return []  # would otherwise argpartition-slice the whole corpus
        top = np.argpartition(-scores, k - 1)[:k]
        top = top[np.argsort(-scores[top], kind="stable")]
        return [(int(i), float(scores[i])) for i in top if scores[i] > 0.0]

    # -- persistence (rides inside the owning table artifact) ----------------

    def save(self, table_dir: str | pathlib.Path) -> None:
        table_dir = pathlib.Path(table_dir)
        table_dir.mkdir(parents=True, exist_ok=True)
        np.savez(
            table_dir / "fts_postings.npz",
            indptr=self._indptr,
            doc_ids=self._doc_ids,
            tfs=self._tfs,
            doc_len=self._doc_len,
        )
        meta = {"k1": self.k1, "b": self.b, "avg_len": self._avg_len,
                "fingerprint": self._fingerprint, "terms": self._terms}
        (table_dir / "fts_meta.json").write_text(json.dumps(meta))

    @classmethod
    def load(
        cls,
        table_dir: str | pathlib.Path,
        expected_docs: int | None = None,
        expected_fingerprint: str | None = None,
    ) -> BM25TextIndex | None:
        """Open saved postings; returns None when absent OR when the saved
        doc count / corpus fingerprint disagrees with the caller's live
        corpus (a stale artifact from an earlier corpus — even one of
        identical size — must never be adopted; callers fall back to a
        lazy rebuild from the live store)."""
        table_dir = pathlib.Path(table_dir)
        meta_path = table_dir / "fts_meta.json"
        npz_path = table_dir / "fts_postings.npz"
        if not (meta_path.exists() and npz_path.exists()):
            return None
        meta = json.loads(meta_path.read_text())
        self = cls(k1=meta["k1"], b=meta["b"])
        self._terms = list(meta["terms"])
        self._term_pos = {t: i for i, t in enumerate(self._terms)}
        self._avg_len = float(meta["avg_len"])
        # pre-fingerprint artifacts (no "fingerprint" key) fail the content
        # check below and are rebuilt rather than trusted
        self._fingerprint = meta.get("fingerprint", "")
        arrays = np.load(npz_path)
        self._indptr = arrays["indptr"]
        self._doc_ids = arrays["doc_ids"]
        self._tfs = arrays["tfs"]
        self._doc_len = arrays["doc_len"]
        if expected_docs is not None and self.num_docs != expected_docs:
            return None
        if (
            expected_fingerprint is not None
            and self._fingerprint != expected_fingerprint
        ):
            return None
        self._finalize()
        return self


def remove_artifacts(table_dir: str | pathlib.Path) -> None:
    """Delete saved postings — called by an index save() whose current
    corpus has no text column, so a prior corpus's files can't linger."""
    table_dir = pathlib.Path(table_dir)
    for name in ("fts_postings.npz", "fts_meta.json"):
        (table_dir / name).unlink(missing_ok=True)


def build_for_store(store, text_col: str) -> BM25TextIndex:
    """Build postings over a RecordStore's text column (empty corpus when
    the column is absent) — the single lazy-build path both backends share."""
    index = BM25TextIndex()
    index.build(texts_for(store.records, text_col))
    return index


def search_text_rows(store, text_index: BM25TextIndex, text: str,
                     exclude_item_ids: list[str] | None, top_k: int):
    """Shared backend glue: run BM25 over the store's rows and return row
    payloads + ``score``, with id exclusion semantics identical to vector
    ``search`` (reference prefilter, ``xfmr_rec/index.py:238-246``)."""
    exclude_positions = [
        store._pos[i] for i in (exclude_item_ids or []) if i in store._pos
    ]
    out = []
    for pos, score in text_index.search(
        text, top_k=top_k, exclude_positions=exclude_positions
    ):
        row = store.row(pos)
        row["score"] = score
        out.append(row)
    return out


def load_validated(table_dir, records, text_col: str) -> BM25TextIndex | None:
    """Open saved postings for a live records frame, or None.

    Single staleness protocol shared by both index backends: artifact
    presence is checked FIRST (computing the corpus fingerprint costs a
    full stringify+hash sweep — O(corpus) wasted work when nothing was
    persisted, which is the common case for non-FTS tables), then the doc
    count and content fingerprint must both match the live corpus.
    """
    table_dir = pathlib.Path(table_dir)
    if not (
        (table_dir / "fts_meta.json").exists()
        and (table_dir / "fts_postings.npz").exists()
    ):
        return None
    return BM25TextIndex.load(
        table_dir,
        expected_docs=len(records),
        expected_fingerprint=corpus_fingerprint(texts_for(records, text_col)),
    )

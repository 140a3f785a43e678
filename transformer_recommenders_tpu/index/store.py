"""Host-side metadata store: id <-> row mapping + record payloads.

Replaces the metadata half of the reference's LanceDB table (BTree id
index + row payloads; ``xfmr_rec/index.py:184-185,257-292``).  Records are
a pandas DataFrame (parquet round-trip) with an O(1) id -> position map;
the embedding matrix lives separately on device (``DeviceIndex``) or in
numpy (``HostIndex``).
"""

from __future__ import annotations

import pathlib
from typing import Any

import numpy as np
import pandas as pd


class RecordStore:
    def __init__(self, records: pd.DataFrame, id_col: str) -> None:
        self.records = records.reset_index(drop=True)
        self.id_col = id_col
        self._pos = {v: i for i, v in enumerate(self.records[id_col])}

    def __len__(self) -> int:
        return len(self.records)

    def row(self, position: int) -> dict[str, Any]:
        return _clean(self.records.iloc[position].to_dict())

    def get_ids(self, ids: list[str]) -> list[dict[str, Any]]:
        """Rows matching ``ids`` in TABLE order (SQL ``IN`` semantics,
        parity: ``xfmr_rec/index.py:257-273``); missing ids are skipped."""
        wanted = {i for i in ids if i in self._pos}
        positions = sorted(self._pos[i] for i in wanted)
        return [self.row(p) for p in positions]

    def get_id(self, id_val: str | None) -> dict[str, Any]:
        """First row matching ``id_val`` or ``{}``
        (parity: ``xfmr_rec/index.py:275-292``)."""
        if id_val is None or id_val not in self._pos:
            return {}
        return self.row(self._pos[id_val])

    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        self.records.to_parquet(path, index=False)

    @classmethod
    def load(cls, path: str | pathlib.Path, id_col: str) -> RecordStore:
        return cls(pd.read_parquet(path), id_col)


def _clean(record: dict[str, Any]) -> dict[str, Any]:
    """numpy scalars/arrays -> plain python for JSON-serializable payloads."""
    out = {}
    for k, v in record.items():
        if isinstance(v, np.generic):
            out[k] = v.item()
        elif isinstance(v, np.ndarray):
            out[k] = v.tolist()
        elif isinstance(v, dict):
            out[k] = _clean(v)
        else:
            out[k] = v
    return out

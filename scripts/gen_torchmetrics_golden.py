"""Generate tests/golden/metrics_torchmetrics.json.

Cross-validation of the on-device closed-form retrieval metrics
(``ops/metrics.py``) against the reference's torchmetrics functionals
(``/root/reference/xfmr_rec/metrics.py:6-14``), per VERDICT round-1 item #5.

Two modes:

- with ``torchmetrics`` importable (any dev machine / CI): every case is
  computed by the REAL ``torchmetrics.functional.retrieval`` functions and
  the transcription oracle below is asserted against them; the golden file
  records ``"source": "torchmetrics <version>"``.
- without it (this hermetic environment): the oracle — a literal numpy
  transcription of the torchmetrics v1.x source, function by function — is
  the generator and ``"source": "oracle"``.  Re-running this script in an
  environment WITH torchmetrics re-verifies and upgrades the file in place.

Usage: ``python scripts/gen_torchmetrics_golden.py``
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

GOLDEN_PATH = pathlib.Path(__file__).parent.parent / "tests" / "golden"


# ---------------------------------------------------------------------------
# literal transcription of torchmetrics.functional.retrieval (v1.x)
# ---------------------------------------------------------------------------


def _top_k_slice(preds: np.ndarray, target: np.ndarray, top_k: int):
    """target re-ordered by preds descending, truncated to top_k —
    the shared prologue of every torchmetrics retrieval functional."""
    order = np.argsort(-preds, kind="stable")
    idx = order[: min(top_k, len(preds))]
    return preds[idx], target[idx]


def retrieval_normalized_dcg(preds, target, top_k):
    # torchmetrics src: sorted_target/ideal_target truncated; linear gain;
    # discount log2(pos+1); 0 when ideal DCG is 0
    _, sorted_target = _top_k_slice(preds, target, top_k)
    ideal_target = np.sort(target)[::-1][:top_k]

    def dcg(t):
        return float(np.sum(t / np.log2(np.arange(len(t)) + 2.0)))

    ideal = dcg(ideal_target)
    return dcg(sorted_target) / ideal if ideal > 0 else 0.0


def retrieval_average_precision(preds, target, top_k):
    # torchmetrics src: positions of hits within the truncated list;
    # mean of (j / position_j); 0.0 when no hits in top_k
    _, t = _top_k_slice(preds, target, top_k)
    positions = np.nonzero(t)[0] + 1
    if len(positions) == 0:
        return 0.0
    return float(np.mean((np.arange(len(positions)) + 1) / positions))


def retrieval_auroc(preds, target, top_k):
    # torchmetrics src: truncate, then `(0 not in target) or (1 not in
    # target)` -> 0.0; else binary AUROC (= correctly-ordered pair fraction
    # for strictly-decreasing preds)
    p, t = _top_k_slice(preds, target, top_k)
    if (0 not in t) or (1 not in t):
        return 0.0
    pos = p[t == 1][:, None]
    neg = p[t == 0][None, :]
    correct = (pos > neg).sum() + 0.5 * (pos == neg).sum()
    return float(correct / (pos.size * neg.size))


def retrieval_precision(preds, target, top_k):
    _, t = _top_k_slice(preds, target, top_k)
    return float(t.sum() / top_k)


def retrieval_recall(preds, target, top_k):
    _, t = _top_k_slice(preds, target, top_k)
    total = target.sum()
    return float(t.sum() / total) if total > 0 else 0.0


def retrieval_hit_rate(preds, target, top_k):
    _, t = _top_k_slice(preds, target, top_k)
    return float(t.sum() > 0)


def retrieval_reciprocal_rank(preds, target, top_k):
    _, t = _top_k_slice(preds, target, top_k)
    positions = np.nonzero(t)[0]
    return float(1.0 / (positions[0] + 1)) if len(positions) else 0.0


ORACLE_FNS = {
    "retrieval_normalized_dcg": retrieval_normalized_dcg,
    "retrieval_average_precision": retrieval_average_precision,
    "retrieval_auroc": retrieval_auroc,
    "retrieval_precision": retrieval_precision,
    "retrieval_recall": retrieval_recall,
    "retrieval_hit_rate": retrieval_hit_rate,
    "retrieval_reciprocal_rank": retrieval_reciprocal_rank,
}


def reference_protocol(rel_topk: list[int], n_targets: int, top_k: int):
    """Build (preds, target) exactly like ``compute_retrieval_metrics``
    (``/root/reference/xfmr_rec/metrics.py:65-78``): rec list of length
    top_k with binary relevance ``rel_topk``, targets missing from the recs
    appended at the end, scores linspace(1, 0)."""
    n_missing = n_targets - sum(rel_topk)
    assert n_missing >= 0
    target = np.asarray(list(rel_topk) + [1] * n_missing, np.int64)
    preds = np.linspace(1, 0, len(target))
    return preds, target


def try_torchmetrics():
    try:
        import torchmetrics
        import torchmetrics.functional.retrieval as tmr

        return torchmetrics.__version__, tmr
    except ImportError:
        return None, None


def make_cases(seed: int = 0) -> list[dict]:
    rng = np.random.default_rng(seed)
    cases = []
    # deterministic edge cases first
    edges = [
        ([0] * 20, 5, 20),          # no hits in top_k
        ([1] * 20, 20, 20),         # ALL positives (auroc class bail-out)
        ([1] * 20, 25, 20),         # all positives + extra appended targets
        ([1] + [0] * 19, 1, 20),    # single hit at rank 1
        ([0] * 19 + [1], 1, 20),    # single hit at last rank
        ([0] * 19 + [1], 40, 20),   # deep target set
        ([1, 0, 1, 0, 1] + [0] * 15, 3, 20),
        ([0, 1] * 10, 10, 20),
        ([1], 1, 1),                # top_k = 1
        ([1, 1, 0], 2, 3),
    ]
    for rel, n_targets, top_k in edges:
        cases.append({"rel": rel, "n_targets": n_targets, "top_k": top_k})
    for _ in range(200):
        top_k = int(rng.choice([1, 3, 5, 10, 20]))
        rel = rng.binomial(1, rng.uniform(0.05, 0.9), size=top_k).tolist()
        extra = int(rng.integers(0, 30))
        cases.append({"rel": rel, "n_targets": sum(rel) + extra, "top_k": top_k})
    # n_targets == 0 is excluded: the reference returns {} for empty targets
    return [c for c in cases if c["n_targets"] > 0]


def main() -> None:
    version, tmr = try_torchmetrics()
    cases = make_cases()
    for case in cases:
        preds, target = reference_protocol(case["rel"], case["n_targets"], case["top_k"])
        expected = {
            name: fn(preds, target, case["top_k"]) for name, fn in ORACLE_FNS.items()
        }
        if tmr is not None:
            import torch

            for name in ORACLE_FNS:
                tm_val = float(
                    getattr(tmr, name)(
                        preds=torch.as_tensor(preds, dtype=torch.float32),
                        target=torch.as_tensor(target, dtype=torch.long),
                        top_k=case["top_k"],
                    )
                )
                if abs(tm_val - expected[name]) > 1e-6:
                    msg = (
                        f"oracle disagrees with torchmetrics on {name}: "
                        f"{expected[name]} vs {tm_val} for case {case}"
                    )
                    raise AssertionError(msg)
                expected[name] = tm_val
        case["expected"] = expected

    GOLDEN_PATH.mkdir(parents=True, exist_ok=True)
    payload = {
        "source": f"torchmetrics {version}" if version else "oracle",
        "protocol": "xfmr_rec/metrics.py:65-78",
        "cases": cases,
    }
    out = GOLDEN_PATH / "metrics_torchmetrics.json"
    out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {len(cases)} cases to {out} (source: {payload['source']})")


if __name__ == "__main__":
    main()

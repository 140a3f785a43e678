"""Native C++ batched sampler: build, invariants, determinism, throughput.

The native sampler must obey the exact sampling rules of the numpy path
(tests/test_data.py): positions sorted & excluding the final event,
positives strictly from the future window, negatives outside the full
history without duplicates.
"""

import numpy as np
import pytest

from transformer_recommenders_tpu.configs import SeqDataConfig
from transformer_recommenders_tpu.data.dataset import SeqData
from transformer_recommenders_tpu.native import load_native_sampler

native = load_native_sampler()
pytestmark = pytest.mark.skipif(native is None, reason="no C++ toolchain")


def make_seqdata(backend="native", max_seq_length=4, pos_lookahead=0, n_items=40):
    item_ids = [f"i{k}" for k in range(1, n_items + 1)]
    histories = [
        (np.asarray([f"i{k}" for k in range(1, 11)]), np.ones(10, bool)),
        (np.asarray([f"i{k}" for k in range(5, 25)]), np.ones(20, bool)),
        (np.asarray(["i1", "i2"]), np.asarray([True, True])),
    ]
    return SeqData(
        SeqDataConfig(max_seq_length=max_seq_length, pos_lookahead=pos_lookahead),
        item_ids=item_ids,
        histories=histories,
        seed=3,
        backend=backend,
    )


def test_native_loads():
    assert native is not None


def test_native_batch_invariants():
    sd = make_seqdata()
    row_map = {tuple(idx.tolist()): (idx, lab) for idx, lab in sd.rows}
    for batch in sd.epoch_batches(0, batch_size=4):
        hist = batch["history_item_idx"]
        pos = batch["pos_item_idx"]
        neg = batch["neg_item_idx"]
        assert hist.shape == (4, 4)
        for b in range(4):
            valid = hist[b] != 0
            if not valid.any():
                continue
            h, p, n = hist[b][valid], pos[b][valid], neg[b][valid]
            # find the source row: h must be a subsequence of some row
            src = None
            for idx, _ in sd.rows:
                positions = []
                k = 0
                ok = True
                for v in h:
                    while k < len(idx) and idx[k] != v:
                        k += 1
                    if k >= len(idx):
                        ok = False
                        break
                    positions.append(k)
                    k += 1
                if ok:
                    src = idx
                    break
            assert src is not None, (h, [r[0] for r in sd.rows])
            # negatives outside that user's history, distinct, in range
            assert set(n.tolist()).isdisjoint(set(src.tolist()))
            assert len(set(n.tolist())) == len(n)
            assert ((n >= 1) & (n <= sd.num_items)).all()
            # positives are real items
            assert (p >= 1).all()


def test_native_lookahead_next_item():
    sd = make_seqdata(max_seq_length=9, pos_lookahead=1)
    batch = next(iter(sd.epoch_batches(0, batch_size=3)))
    hist, pos = batch["history_item_idx"], batch["pos_item_idx"]
    for b in range(3):
        valid = hist[b] != 0
        # ring construction: with lookahead=1 the positive is the next idx
        np.testing.assert_array_equal(pos[b][valid], hist[b][valid] + 1)


def test_native_determinism_and_epoch_variation():
    sd = make_seqdata()
    b1 = next(iter(sd.epoch_batches(0, 4)))
    b2 = next(iter(sd.epoch_batches(0, 4)))
    b3 = next(iter(sd.epoch_batches(1, 4)))
    np.testing.assert_array_equal(b1["neg_item_idx"], b2["neg_item_idx"])
    assert not np.array_equal(b1["neg_item_idx"], b3["neg_item_idx"])


def test_native_covers_all_rows_per_epoch():
    sd = make_seqdata()
    seen = 0
    for batch in sd.epoch_batches(0, batch_size=2):
        seen += int((batch["history_item_idx"] != 0).any(axis=1).sum())
    # every non-padded row appears exactly once per epoch
    assert seen == len(sd)


def test_native_matches_numpy_distribution():
    """Marginal stats of both backends agree (same distribution, different
    RNG streams): mean positive offset and negative exclusion behavior."""
    sd_native = make_seqdata(backend="native")
    sd_numpy = make_seqdata(backend="numpy")

    def collect(sd, epochs=40):
        pos_vals = []
        for e in range(epochs):
            for batch in sd.epoch_batches(e, 4):
                v = batch["pos_item_idx"][batch["history_item_idx"] != 0]
                pos_vals += v.tolist()
        return np.asarray(pos_vals)

    pn, pp = collect(sd_native), collect(sd_numpy)
    assert abs(pn.mean() - pp.mean()) < 1.0  # item idx scale ~1..24


def test_native_throughput_exceeds_numpy():
    rng = np.random.default_rng(0)
    n_users, hist_len = 200, 200
    item_ids = [f"i{k}" for k in range(1, 2001)]
    histories = [
        (
            np.asarray([f"i{k}" for k in rng.integers(1, 2001, hist_len)]),
            np.ones(hist_len, bool),
        )
        for _ in range(n_users)
    ]
    import time

    def run(backend):
        sd = SeqData(
            SeqDataConfig(max_seq_length=32),
            item_ids=item_ids,
            histories=histories,
            seed=0,
            backend=backend,
        )
        t0 = time.time()
        for batch in sd.epoch_batches(0, 128):
            pass
        return time.time() - t0

    t_native = run("native")
    t_numpy = run("numpy")
    assert t_native < t_numpy, (t_native, t_numpy)


def test_thread_count_invariance():
    """The multi-threaded sampler (round 3) is bit-identical at every
    thread count: per-row RNG streams are keyed on (seed, epoch, row, b)
    with no carried state, and rows write disjoint output slices."""
    from transformer_recommenders_tpu.native import load_native_sampler

    ns = load_native_sampler()
    if ns is None:
        import pytest

        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(5)
    item_ids = [str(i) for i in range(1, 301)]
    histories = [
        (rng.integers(1, 301, int(rng.integers(5, 60))).astype(str),
         rng.random(1) < 2.0)  # placeholder labels fixed below
        for _ in range(200)
    ]
    histories = [
        (ids, np.ones(len(ids), bool)) for ids, _ in histories
    ]
    sd = SeqData(
        SeqDataConfig(max_seq_length=16),
        item_ids=item_ids, histories=histories, seed=3, backend="native",
    )
    order = ns.shuffled_order(len(sd.rows), 3, 0)[:64].astype(np.int64)
    outs = [
        ns.sample_batch(
            sd._values, sd._labels, sd._offsets, order,
            max_seq=16, pos_lookahead=4, num_items=300, seed=3, epoch=0,
            num_threads=nt,
        )
        for nt in (1, 2, 3, 8, 0)
    ]
    for out in outs[1:]:
        for a, b in zip(outs[0], out):
            np.testing.assert_array_equal(a, b)

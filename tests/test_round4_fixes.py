"""Tests for the round-4 ADVICE fixes (ADVICE.md round 3).

1. native sampler builds with -pthread (std::thread on glibc < 2.34 aborts
   without it) — ``native/build.py``;
2. ``metrics_text`` snapshots the counter dicts under the lock so a scrape
   racing a first-seen label can't hit "dictionary changed size during
   iteration" — ``serving/asgi.py``;
3. the shared micro-batch encode time aggregates ONCE per flush (amortized
   per waiter), not batch_n times — ``serving/service.py``;
4. the fma calibration body is genuinely non-affine on the operating
   domain (the min-clamp binds for some lanes every iteration) —
   ``ops/vpu_calibration.py``.
"""

import asyncio
import threading
import time

import numpy as np
import pytest

from transformer_recommenders_tpu.serving.asgi import CURRENT_TRACE, JSONApp, Trace


class TestMetricsTextSnapshot:
    def test_scrape_survives_concurrent_counter_mutation(self):
        app = JSONApp()
        stop = threading.Event()
        errors: list[Exception] = []

        def mutate():
            i = 0
            while not stop.is_set():
                # first-seen labels force dict growth mid-iteration
                with app._counter_lock:
                    app.request_counts[(f"route{i}", 200)] = 1
                    app.span_seconds[f"span{i}"] = 0.001
                i += 1

        def scrape():
            try:
                while not stop.is_set():
                    app.metrics_text()
            except Exception as exc:  # noqa: BLE001 — the bug under test
                errors.append(exc)

        threads = [threading.Thread(target=mutate), threading.Thread(target=scrape)]
        for t in threads:
            t.start()
        time.sleep(0.5)
        stop.set()
        for t in threads:
            t.join()
        assert not errors

    def test_exposition_contains_all_counter_families(self):
        app = JSONApp()
        app.request_counts[("recommend", 200)] = 3
        app.request_seconds["recommend"] = 0.5
        app.span_seconds["encode"] = 0.25
        app.span_metrics["batch_size"] = 12
        text = app.metrics_text()
        assert 'xrt_requests_total{route="recommend",status="200"} 3' in text
        assert 'xrt_span_seconds_total{span="encode"} 0.250000' in text
        assert 'xrt_span_metric_total{metric="batch_size"} 12.000000' in text


class TestEncodeSpanAmortization:
    def test_header_only_spans_never_aggregate(self):
        """Trace.header_spans render on Server-Timing but JSONApp._dispatch
        must not fold them into span_seconds."""
        tr = Trace()
        tr.add("encode", 0.010)
        tr.add_header_only("encode_batch", 0.040)
        header = tr.header()
        assert "encode;dur=10.00" in header
        assert "encode_batch;dur=40.00" in header
        # the aggregation loop in _dispatch iterates trace.spans only
        assert ("encode_batch", 0.040) not in tr.spans

    def test_batched_waiters_aggregate_one_encode(self):
        """batch_n concurrent waiters sharing one forward must contribute
        exactly one forward's seconds to the aggregate (encode_s/batch_n
        each), not batch_n x."""
        from transformer_recommenders_tpu.serving.service import MicroBatcher

        flushes: list[list] = []

        def fn(items):
            flushes.append(list(items))
            time.sleep(0.02)
            return [i * 2 for i in items]

        batcher = MicroBatcher(fn, max_batch=4, window_ms=200.0)
        traces: list[Trace] = []
        results: list = []

        def worker(i):
            async def run():
                tr = Trace()
                token = CURRENT_TRACE.set(tr)
                try:
                    res = await batcher.submit(i)
                finally:
                    CURRENT_TRACE.reset(token)
                traces.append(tr)
                results.append(res)

            asyncio.run(run())

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert sorted(results) == [0, 2, 4, 6]
        assert len(flushes) == 1  # one flush, one forward
        aggregate = sum(
            s for tr in traces for name, s in tr.spans if name == "encode"
        )
        # every waiter's header carries the batch's FULL forward time...
        batch_encodes = {
            s for tr in traces for name, s in tr.header_spans if name == "encode_batch"
        }
        assert len(batch_encodes) == 1  # shared value from the one flush
        # ...while the aggregate sums to exactly one forward, not batch_n x
        assert aggregate == pytest.approx(next(iter(batch_encodes)), rel=1e-9)


class TestFmaChainNonAffine:
    def test_quadratic_map_stays_bounded_and_varies(self):
        """calibrate_vpu.py feeds inputs in [0.5, 1.5): the damped logistic
        body must keep iterates in (0, 1.001) and produce data-dependent
        values (distinct inputs -> distinct outputs) — and, unlike both
        folded predecessors (|x*a-b| and min(x*a+b, 1)), its composition
        has no affine-with-clamp closed form the compiler can collapse."""
        from transformer_recommenders_tpu.ops.vpu_calibration import reference_chain

        rng = np.random.default_rng(0)
        x = rng.random((64, 64), np.float32) + 0.5
        out = np.asarray(reference_chain(x, iters=16, mix="fma"))
        assert np.all(out > 0.0)
        assert np.all(out < 1.001)
        # quadratic convergence toward the damped fixed point, but after
        # only 16 iterations distinct inputs are still distinguishable
        assert len(np.unique(out)) > 1

    def test_kernel_matches_oracle_interpret(self):
        import jax.numpy as jnp

        from transformer_recommenders_tpu.ops.vpu_calibration import (
            reference_chain,
            vpu_chain,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((8, 128), np.float32) + 0.5)
        got = vpu_chain(x, iters=16, mix="fma", interpret=True)
        want = reference_chain(x, iters=16, mix="fma")
        # a few ulps of drift accumulate over the chain (fma contraction
        # differences between the interpreted kernel and numpy)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


class TestNativeSamplerPthread:
    def test_build_command_includes_pthread(self):
        import inspect

        from transformer_recommenders_tpu.native import build

        assert '"-pthread"' in inspect.getsource(build._build)

    def test_sampler_builds_and_runs_threaded(self):
        from transformer_recommenders_tpu.native.build import load_native_sampler

        sampler = load_native_sampler()
        if sampler is None:
            pytest.skip("no toolchain")
        values = np.arange(1, 33, dtype=np.int32)
        labels = np.ones(32, np.uint8)
        offsets = np.array([0, 16, 32], np.int64)
        rows = np.array([0, 1], np.int64)
        hist, pos, neg = sampler.sample_batch(
            values, labels, offsets, rows,
            max_seq=8, pos_lookahead=0, num_items=64, seed=7, epoch=0,
            num_threads=4,
        )
        hist1, pos1, neg1 = sampler.sample_batch(
            values, labels, offsets, rows,
            max_seq=8, pos_lookahead=0, num_items=64, seed=7, epoch=0,
            num_threads=1,
        )
        np.testing.assert_array_equal(hist, hist1)
        np.testing.assert_array_equal(pos, pos1)
        np.testing.assert_array_equal(neg, neg1)

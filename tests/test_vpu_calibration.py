"""The VPU calibration kernel computes exactly the chain it claims to time
(interpret mode vs the numpy oracle) — a wrong chain would calibrate a
fictional throughput."""

import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.ops.vpu_calibration import (
    OPS_PER_ITER,
    reference_chain,
    vpu_chain,
)


@pytest.mark.parametrize("mix", sorted(OPS_PER_ITER))
def test_chain_matches_oracle(mix):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 256), np.float32) + 0.5)
    iters = 16
    got = vpu_chain(x, iters=iters, mix=mix, interpret=True)
    want = reference_chain(x, iters=iters, mix=mix)
    # rtol 2e-5: the compiled chain may contract mul+add into an FMA,
    # diverging from the numpy oracle by a few ULP per iteration
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)
    assert np.isfinite(np.asarray(got)).all()

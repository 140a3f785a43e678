"""VPU-throughput calibration microkernel (VERDICT round-2 item #2).

The round-2 roofline (BASELINE.md) judged the fused kernels against MXU/HBM
bounds only and asserted they are VPU-issue-bound from cross-kernel
consistency.  This kernel measures the *actual* achievable element-ops/ms
on the chip, per op class, so the speed-of-light table can carry a measured
VPU row: a resident VMEM tile is run through K chained iterations of a
representative op mix, and timing two K values cancels the fixed dispatch +
load/store cost — the slope IS the per-element-op cost.

Op mixes (chosen to bracket what the fused layer/loss kernels execute):

- ``fma``    — ``0.999 * x * (2 - x)``: 3 element-ops/iter (sub + two
  muls).  Lesson history: ``|x*a - b|`` was value-invisible on the
  positive domain (round-3 advisor finding), and the round-4 first fix
  ``min(x*a + b, 1)`` STILL folded — min/max against a constant
  distributes through affine maps (``min(u,c)*a+b = min(ua+b, ca+b)``),
  so the whole chain collapses to one fma + one min (measured: K=4096 in
  0.04 ms).  A quadratic map has no such closed form — composing it
  squares the polynomial degree — and the damping keeps iterates in
  (0, 1.001) forever.  ``calibrate_vpu.py`` additionally gates EVERY
  timed point (not just the slope) against the physical throughput
  ceiling, so any future fold fails loudly.
- ``exp``    — ``exp(x*s)``: 1 transcendental + 1 mul/iter; softmax cost.
- ``select`` — compare + select + mul + add: 4 element-ops/iter; the
  masking/dropout pattern.

No reference analogue (the reference has no kernels); this is measurement
infrastructure for BASELINE.json's >=80%-of-SoL criterion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# element-ops each mix executes per element per iteration (the unit the
# roofline counts: one VPU lane-op, transcendentals counted as one)
OPS_PER_ITER = {"fma": 3, "exp": 2, "select": 4}
_UNROLL = 8


def _chain_kernel(x_ref, o_ref, *, iters: int, mix: str):
    x = x_ref[...]

    def body_fma(x):
        # damped logistic map: genuinely non-foldable (composition squares
        # the polynomial degree — see module docstring for the two folded
        # predecessors) and bounded: x in (0, 1.001) maps into itself
        return jnp.float32(0.999) * x * (2.0 - x)

    def body_exp(x):
        # keep the operand bounded: x stays ~= 1.0 forever
        return jnp.exp(x * 1e-8)

    def body_select(x):
        return jnp.where(x > 0.5, x * 0.999, x + 0.001)

    body = {"fma": body_fma, "exp": body_exp, "select": body_select}[mix]
    assert iters % _UNROLL == 0

    def step(_, x):
        for _ in range(_UNROLL):
            x = body(x)
        return x

    x = jax.lax.fori_loop(0, iters // _UNROLL, step, x)
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("iters", "mix", "interpret"))
def vpu_chain(x: jax.Array, *, iters: int, mix: str = "fma", interpret: bool = False):
    """Run ``iters`` chained iterations of ``mix`` over ``x`` (resident tile)."""
    return pl.pallas_call(
        functools.partial(_chain_kernel, iters=iters, mix=mix),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def reference_chain(x: jax.Array, *, iters: int, mix: str = "fma") -> jax.Array:
    """Pure-jnp oracle for the kernel (correctness tests)."""
    import numpy as np

    x = np.asarray(x, np.float32)
    for _ in range(iters):
        if mix == "fma":
            x = np.float32(0.999) * x * (np.float32(2.0) - x)
        elif mix == "exp":
            x = np.exp(x * np.float32(1e-8), dtype=np.float32)
        else:
            x = np.where(x > 0.5, x * np.float32(0.999), x + np.float32(0.001))
    return jnp.asarray(x)

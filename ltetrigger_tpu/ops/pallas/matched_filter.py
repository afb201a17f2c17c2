"""Pallas TPU kernel: fused PSS matched filter + power.

Same math as ops.correlate.pss_correlate_power_v2 (blocked-Toeplitz MXU
matmuls), but with the correlation intermediate kept in VMEM and squared to
power in-kernel — the [75, 768] complex correlation never round-trips
through HBM.  One grid cell = one window.

STATUS: demoted to an educational escape hatch, deliberately NOT on the
hot path (VERDICT r1 item 9 resolution).  Fenced on-hardware measurement
(BENCHNOTES.md) showed XLA already fuses the downstream peak/PSR reduction
into the matmul consumer — the [B, 3, 9600] power tensor is never
materialized in HBM when a reduction consumes it, which was this kernel's
entire premise.  The XLA paths in ops/correlate.py are the defaults and the
golden references; this kernel is kept compiling + equivalence-tested
(tests/test_ops.py interpret mode, bench.py --verify on hardware) as the
starting point if a future op genuinely needs manual fusion.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ltecore.constants import HALF_FRAME_LENGTH, SYMBOL_SZ
from .. import cplx
from ..correlate import N_ROOTS, SEARCH_LEN, V2_WINDOW, _toeplitz_weights

NBLK = HALF_FRAME_LENGTH // SYMBOL_SZ     # 75


def _kernel(x0_ref, x1_ref, wl_ref, wu_ref, out_ref):
    c = jnp.dot(x0_ref[0], wl_ref[:], preferred_element_type=jnp.float32) \
        + jnp.dot(x1_ref[0], wu_ref[:], preferred_element_type=jnp.float32)
    for t in range(N_ROOTS):
        cre = c[:, t * 2 * SYMBOL_SZ: t * 2 * SYMBOL_SZ + SYMBOL_SZ]
        cim = c[:, t * 2 * SYMBOL_SZ + SYMBOL_SZ: (t + 1) * 2 * SYMBOL_SZ]
        out_ref[0, t] = cre * cre + cim * cim


@functools.partial(jax.jit, static_argnames=())
def pss_correlate_power_pallas(window: cplx.Pair) -> jnp.ndarray:
    """pair of [B, >= V2_WINDOW] float32 -> [B, 3, SEARCH_LEN] float32."""
    wr, wi = window
    assert wr.ndim == 2, "pallas path is batched-2D only"
    b = wr.shape[0]
    x0 = jnp.concatenate(
        [wr[:, :HALF_FRAME_LENGTH].reshape(b, NBLK, SYMBOL_SZ),
         wi[:, :HALF_FRAME_LENGTH].reshape(b, NBLK, SYMBOL_SZ)], axis=-1)
    x1 = jnp.concatenate(
        [wr[:, SYMBOL_SZ:V2_WINDOW].reshape(b, NBLK, SYMBOL_SZ),
         wi[:, SYMBOL_SZ:V2_WINDOW].reshape(b, NBLK, SYMBOL_SZ)], axis=-1)
    WLn, WUn = _toeplitz_weights()
    WL = jnp.asarray(WLn)
    WU = jnp.asarray(WUn)

    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, NBLK, 2 * SYMBOL_SZ), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBLK, 2 * SYMBOL_SZ), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * SYMBOL_SZ, N_ROOTS * 2 * SYMBOL_SZ),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * SYMBOL_SZ, N_ROOTS * 2 * SYMBOL_SZ),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_ROOTS, NBLK, SYMBOL_SZ),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, N_ROOTS, NBLK, SYMBOL_SZ),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * NBLK * 2 * SYMBOL_SZ * N_ROOTS * 2 * SYMBOL_SZ * b,
            bytes_accessed=(2 * b * NBLK * 2 * SYMBOL_SZ
                            + 2 * 2 * SYMBOL_SZ * N_ROOTS * 2 * SYMBOL_SZ
                            + b * N_ROOTS * SEARCH_LEN) * 4,
            transcendentals=0),
    )(x0, x1, WL, WU)
    return out.reshape(b, N_ROOTS, SEARCH_LEN)

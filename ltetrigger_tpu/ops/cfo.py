"""Carrier-frequency-offset estimation and correction (jitted, real-pair).

Replaces srslte_pss_cfo_compute / srslte_cfo_correct (reference
lib/pss_impl.cc:197-204): the CFO estimate is the phase between the two
half-symbol correlations of the received PSS against the local replica, in
units of the subcarrier spacing; correction is one cos/sin phase-ramp
multiply over the half-frame (the NCO becomes a vectorized rotation).
"""

import functools

import jax.numpy as jnp
import numpy as np

from ..ltecore import pss as pssmod
from ..ltecore.constants import SYMBOL_SZ
from . import cplx, dft


@functools.lru_cache(maxsize=None)
def replica_pairs():
    """[3, 128] float32 (re, im) of the unit-energy time replicas."""
    return cplx.const(pssmod.pss_time())


def cfo_estimate(pss_symbol: cplx.Pair, replica: cplx.Pair) -> jnp.ndarray:
    """CFO in subcarrier-spacing units from a received 128-sample PSS symbol.

    pss_symbol: pair of [..., 128] (aligned samples at [832, 960))
    replica:    pair of [..., 128] local time replica for the root under test
    returns:    [...] float32; unambiguous range (-1, 1) subcarriers.
    """
    h = SYMBOL_SZ // 2
    y0 = cplx.dot_conj_sum(cplx.index(pss_symbol, (..., slice(None, h))),
                           cplx.index(replica, (..., slice(None, h))))
    y1 = cplx.dot_conj_sum(cplx.index(pss_symbol, (..., slice(h, None))),
                           cplx.index(replica, (..., slice(h, None))))
    # angle(conj(y0) * y1) / pi
    prod = cplx.mul(cplx.conj(y0), y1)
    return (cplx.angle(prod) / jnp.pi).astype(jnp.float32)


def cfo_correct(x: cplx.Pair, freq) -> cplx.Pair:
    """Multiply by exp(2j*pi*freq*n); freq in cycles/sample.

    Matches srslte_cfo_correct's convention: the caller passes
    freq = -mean_cfo / 128 to remove a +mean_cfo (subcarrier units) offset.
    """
    n = jnp.arange(x[0].shape[-1], dtype=jnp.float32)
    theta = 2 * jnp.pi * jnp.asarray(freq)[..., None] * n
    return cplx.mul(x, cplx.expi(theta))


def cfo_rotate(x: cplx.Pair, freq, offset: int) -> cplx.Pair:
    """Multiply by exp(2j*pi*freq*(offset + n)) — cfo_correct for a segment
    whose sample 0 sits `offset` samples into the frame the frequency ramp
    is anchored to (the grid engine corrects slot-0 tails and lazily
    gathered slot-1 candidates without materializing whole subframes)."""
    n = offset + jnp.arange(x[0].shape[-1], dtype=jnp.float32)
    theta = 2 * jnp.pi * jnp.asarray(freq)[..., None] * n
    return cplx.mul(x, cplx.expi(theta))


@functools.lru_cache(maxsize=None)
def chest_replicas():
    """[3, 62] float32 (re, im) frequency-domain PSS replicas (numpy)."""
    return cplx.const(pssmod.pss_freq_occupied())


def pss_chest(pss_symbol: cplx.Pair, n_id_2: int) -> cplx.Pair:
    """LS channel estimate over the 62 PSS subcarriers.

    Computed on every tracked half-frame by the reference
    (lib/pss_impl.cc:206-209) into a telemetry buffer; the grid engine
    computes the same estimate in pass C (models/trigger.py) and surfaces
    it as `Trigger.channel_estimate`.
    """
    Y = dft.dft_sync(pss_symbol)
    fr, fi = chest_replicas()
    rep = (jnp.asarray(fr)[n_id_2], jnp.asarray(fi)[n_id_2])
    return cplx.mul_conj(Y, rep)

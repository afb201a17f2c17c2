"""Carrier-frequency-offset estimation and correction (jitted).

Replaces srslte_pss_cfo_compute / srslte_cfo_correct (reference
lib/pss_impl.cc:197-204): the CFO estimate is the phase between the two
half-symbol correlations of the received PSS against the local replica, in
units of the subcarrier spacing; correction is one complex phase-ramp
multiply over the half-frame (the NCO becomes a vectorized exp).
"""

import jax.numpy as jnp
import numpy as np

from ..ltecore import pss as pssmod
from ..ltecore.constants import SYMBOL_SZ


def _replicas():
    return jnp.asarray(pssmod.pss_time().astype(np.complex64))


def cfo_estimate(pss_symbol: jnp.ndarray, n_id_2_replica: jnp.ndarray):
    """CFO in subcarrier-spacing units from a received 128-sample PSS symbol.

    pss_symbol: [..., 128] complex64 (the aligned samples at [832, 960))
    n_id_2_replica: [..., 128] local time replica for the root under test
    """
    h = SYMBOL_SZ // 2
    y0 = jnp.sum(jnp.conj(n_id_2_replica[..., :h]) * pss_symbol[..., :h],
                 axis=-1)
    y1 = jnp.sum(jnp.conj(n_id_2_replica[..., h:]) * pss_symbol[..., h:],
                 axis=-1)
    return (jnp.angle(jnp.conj(y0) * y1) / jnp.pi).astype(jnp.float32)


def cfo_correct(x: jnp.ndarray, freq: jnp.ndarray) -> jnp.ndarray:
    """Multiply by exp(2j*pi*freq*n); freq in cycles/sample.

    Matches srslte_cfo_correct's convention: the caller passes
    freq = -mean_cfo / 128 to remove a +mean_cfo (subcarrier units) offset.
    """
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    rot = jnp.exp(2j * jnp.pi * freq[..., None].astype(jnp.float32) * n)
    return (x * rot.astype(jnp.complex64)).astype(jnp.complex64)


def pss_chest(pss_symbol: jnp.ndarray, n_id_2: int | None = None,
              freq_replica: jnp.ndarray | None = None) -> jnp.ndarray:
    """LS channel estimate over the 62 PSS subcarriers.

    Computed-but-unconsumed in the reference (lib/pss_impl.cc:206-209,
    SURVEY §2.2); kept as telemetry here.
    """
    bins = jnp.asarray(pssmod.subcarrier_bins())
    Y = jnp.fft.fft(pss_symbol, axis=-1)[..., bins]
    if freq_replica is None:
        freq_replica = jnp.asarray(
            pssmod.pss_freq_occupied().astype(np.complex64))[n_id_2]
    return (Y * jnp.conj(freq_replica)).astype(jnp.complex64)

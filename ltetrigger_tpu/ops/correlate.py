"""PSS matched filtering on TPU.

The reference's hot loop is srslte_pss_find_pss — an FFTW overlap-add complex
convolution of a 9600-sample half-frame against a 128-tap ZC replica, run on
one CPU thread per N_id_2 chain (reference lib/pss_impl.cc:165, SURVEY §3.2).

TPU-native design: one forward FFT of the window is shared by all three
N_id_2 hypotheses (they become a batch dimension), the per-root products ride
a single batched inverse FFT, and everything stays on device.  Channels add
another leading batch dim via vmap — the three reference threads become lanes
of one tensor program.

corr[r, n] = sum_k window[n + k] * conj(rep[r, k]),  n in [0, 9600)
power      = |corr|^2                  (PSR threshold semantics are power-
                                        domain, matching srsLTE's abs-square)
"""

import functools

import jax.numpy as jnp
import numpy as np

from ..ltecore import pss as pssmod
from ..ltecore.constants import HALF_FRAME_LENGTH, SYMBOL_SZ

FFT_LEN = 16384          # next pow2 >= 9600 + 128; XLA's TPU FFT likes pow2
SEARCH_LEN = HALF_FRAME_LENGTH          # 9600 candidate start positions
WINDOW_LEN = HALF_FRAME_LENGTH + SYMBOL_SZ - 1   # samples the filter reads


@functools.lru_cache(maxsize=None)
def _replica_spectra() -> np.ndarray:
    """[3, FFT_LEN] conj(FFT(replica)) — static correlator weights."""
    reps = pssmod.pss_time()                      # [3, 128] unit energy
    pad = np.zeros((3, FFT_LEN), dtype=np.complex64)
    pad[:, :SYMBOL_SZ] = reps
    return np.conj(np.fft.fft(pad, axis=-1)).astype(np.complex64)


def pss_correlate_power(window: jnp.ndarray) -> jnp.ndarray:
    """|corr|^2 for all 3 roots over one window.

    window: [..., >=WINDOW_LEN] complex64
    returns: [..., 3, SEARCH_LEN] float32
    """
    x = window[..., :WINDOW_LEN]
    X = jnp.fft.fft(x, n=FFT_LEN, axis=-1)                      # [..., L]
    R = jnp.asarray(_replica_spectra())                         # [3, L]
    prod = X[..., None, :] * R                                  # [..., 3, L]
    c = jnp.fft.ifft(prod, axis=-1)[..., :SEARCH_LEN]
    return jnp.square(jnp.abs(c)).astype(jnp.float32)


def peak_and_psr(power: jnp.ndarray, lobe_limit: int = 64):
    """Peak position and peak-to-sidelobe ratio (power domain).

    Vectorized equivalent of srsLTE's compute_peak_sidelobe: walk down the
    main lobe on each side until the first rise (bounded by lobe_limit), then
    the sidelobe is the max outside the lobe.

    power: [..., SEARCH_LEN] float32
    returns: (peak_pos int32 [...], psr float32 [...])
    """
    n = power.shape[-1]
    peak = jnp.argmax(power, axis=-1).astype(jnp.int32)         # [...]
    pk_val = jnp.take_along_axis(power, peak[..., None], axis=-1)[..., 0]

    idx = jnp.arange(n, dtype=jnp.int32)
    rel = idx - peak[..., None]                                 # [..., n]

    # first rise to the right of the peak: smallest d>0 with p[peak+d+1] > p[peak+d]
    shifted = jnp.concatenate([power[..., 1:], power[..., -1:]], axis=-1)
    rise = shifted > power                                       # p[i+1] > p[i]
    right_cand = jnp.where((rel >= 1) & (rel <= lobe_limit) & rise,
                           rel, lobe_limit)
    right_edge = jnp.min(right_cand, axis=-1)                    # lobe extent
    # first rise to the left: smallest d>0 with p[peak-d-1] > p[peak-d]
    shiftedl = jnp.concatenate([power[..., :1], power[..., :-1]], axis=-1)
    risel = shiftedl > power
    left_cand = jnp.where((-rel >= 1) & (-rel <= lobe_limit) & risel,
                          -rel, lobe_limit)
    left_edge = jnp.min(left_cand, axis=-1)

    in_lobe = (rel >= -left_edge[..., None]) & (rel <= right_edge[..., None])
    side = jnp.max(jnp.where(in_lobe, 0.0, power), axis=-1)
    psr = pk_val / jnp.maximum(side, 1e-30)
    return peak, psr.astype(jnp.float32)

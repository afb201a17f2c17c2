"""Integer polyphase decimation to the 1.92 Msps sensing rate (jitted).

Replaces GNU Radio's rational_resampler_ccc (reference
examples/cell_search_file.py:56-57; integer ratios only, :50-54).  TPU-native
shape: the anti-alias FIR runs as a real-channel conv_general_dilated with
window stride = ratio, so XLA lowers it onto the MXU; the IQ pair rides as
two real feature channels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ltecore.refrx import design_lowpass
from . import cplx


@functools.lru_cache(maxsize=None)
def _taps(ratio: int, taps_per_phase: int = 16) -> np.ndarray:
    return design_lowpass(ratio, taps_per_phase).astype(np.float32)


def decimate(x: cplx.Pair, ratio: int) -> cplx.Pair:
    """pair of [..., N] -> pair of [..., ceil(N / ratio)].

    Matches ltecore.refrx.decimate: filter center-aligned (group delay
    compensated), output sample n taken from filtered sample n * ratio.
    """
    if ratio == 1:
        return x
    h = _taps(ratio)
    nt = len(h)
    lead = (nt - 1) // 2
    batch_shape = x[0].shape[:-1]
    n = x[0].shape[-1]

    # real/imag as conv feature channels: [B, 2, N]
    xr = jnp.stack([x[0].reshape(-1, n), x[1].reshape(-1, n)], axis=1)
    # conv_general_dilated correlates (no kernel flip); with the symmetric
    # filter this equals refrx's convolution iff the pad is mirrored.
    xr = jnp.pad(xr, ((0, 0), (0, 0), (nt - 1 - lead, lead)))
    # kernel [out_ch=2, in_ch=2, W] block-diagonal (same filter per channel)
    k = jnp.zeros((2, 2, nt), dtype=jnp.float32)
    k = k.at[0, 0].set(h).at[1, 1].set(h)
    y = jax.lax.conv_general_dilated(
        xr, k, window_strides=(ratio,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    out_n = y.shape[-1]
    return (y[:, 0].reshape(batch_shape + (out_n,)),
            y[:, 1].reshape(batch_shape + (out_n,)))

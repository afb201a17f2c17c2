"""Integer polyphase decimation to the 1.92 Msps sensing rate (jitted).

Replaces GNU Radio's rational_resampler_ccc (reference
examples/cell_search_file.py:56-57; integer ratios only, :50-54).  TPU-native
shape: the anti-alias FIR runs as a real-channel conv_general_dilated with
window stride = ratio, so XLA lowers it onto the MXU; complex data rides as
two real channels (TPU convs are real-valued).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ltecore.refrx import design_lowpass


@functools.lru_cache(maxsize=None)
def _taps(ratio: int, taps_per_phase: int = 16) -> np.ndarray:
    return design_lowpass(ratio, taps_per_phase).astype(np.float32)


def decimate(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """[..., N] complex64 -> [..., N // ratio] at the decimated rate.

    Matches ltecore.refrx.decimate: filter center-aligned (group delay
    compensated), output sample n taken from filtered sample n * ratio.
    """
    if ratio == 1:
        return x
    h = _taps(ratio)
    nt = len(h)
    lead = (nt - 1) // 2
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    xb = x.reshape((-1, n))

    # real/imag as conv feature channels: [B, 2, N]
    xr = jnp.stack([xb.real, xb.imag], axis=1).astype(jnp.float32)
    # conv_general_dilated correlates (no kernel flip); with the symmetric
    # filter this equals refrx's convolution iff the pad is mirrored.
    xr = jnp.pad(xr, ((0, 0), (0, 0), (nt - 1 - lead, lead)))
    # kernel [out_ch=2, in_ch=2, W] block-diagonal (same filter per channel)
    k = jnp.zeros((2, 2, nt), dtype=jnp.float32)
    k = k.at[0, 0].set(h).at[1, 1].set(h)
    y = jax.lax.conv_general_dilated(
        xr, k, window_strides=(ratio,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    out = (y[:, 0] + 1j * y[:, 1]).astype(jnp.complex64)
    return out.reshape(batch_shape + (out.shape[-1],))

"""Wideband channelizer: one wide capture -> many 1.92 Msps sensing lanes.

The reference can only watch one carrier per process (its flowgraph is built
around a single resampler chain).  On TPU, scanning a whole band is the
natural shape: frequency-shift the wideband stream to each candidate center,
low-pass + decimate, and hand the [C, N] channel batch to the sharded scan
engine (parallel/sharded.channel_scan).

Numerical note: the mixer phase 2*pi*f*n needs |phase| precision ~1e-3 at
n up to tens of millions — far beyond float32.  The phase ramp is therefore
generated in float64 *modulo 1* on the host (cheap, streaming), while the
heavy anti-alias decimation runs on device as the usual strided MXU conv
with channels on the batch dim.
"""

from __future__ import annotations

import numpy as np

from ..ltecore.constants import SAMPLE_RATE
from . import cplx, resample


def shift_host(x: np.ndarray, sample_rate: float, offset_hz: float,
               start_index: int = 0) -> np.ndarray:
    """Frequency-shift a complex64 stream by -offset_hz (host, f64 phase)."""
    f = float(offset_hz) / float(sample_rate)
    n = np.arange(start_index, start_index + x.size, dtype=np.float64)
    ph = np.mod(-f * n, 1.0)
    rot = np.exp(2j * np.pi * ph)
    return (x.astype(np.complex128) * rot).astype(np.complex64)


def channelize(x: np.ndarray, sample_rate: float,
               center_offsets_hz) -> cplx.Pair:
    """complex64 [N] wideband -> pair of [C, ~N/ratio] float32 at 1.92 Msps.

    center_offsets_hz: frequencies (relative to the capture center) to
    down-convert; each becomes a channel.  sample_rate must be an integer
    multiple of 1.92 MHz.
    """
    ratio = sample_rate / SAMPLE_RATE
    if abs(ratio - round(ratio)) > 1e-9:
        raise ValueError("sample_rate must be an integer multiple of 1.92 MHz")
    ratio = int(round(ratio))

    shifted = np.stack([shift_host(x, sample_rate, off)
                        for off in center_offsets_hz])
    return resample.decimate(cplx.from_numpy(shifted), ratio)

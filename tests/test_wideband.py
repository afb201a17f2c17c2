"""Wideband channelizer + scan: synthesize two cells at different carrier
offsets inside one wide capture, find both in one pass."""

import numpy as np
import pytest

from ltetrigger_tpu.apps.wideband_scan import wideband_scan
from ltetrigger_tpu.ltecore import synth
from ltetrigger_tpu.ops import channelize, cplx
from tests.conftest import load_frame


def _upconvert(frame_1p92: np.ndarray, wide_rate: float,
               offset_hz: float) -> np.ndarray:
    """Interpolate a 1.92 Msps signal to wide_rate and mix to offset_hz."""
    ratio = int(wide_rate / 1.92e6)
    n = frame_1p92.size
    # zero-stuff + lowpass via FFT interpolation (host-side test utility)
    F = np.fft.fft(frame_1p92)
    Fw = np.zeros(n * ratio, dtype=np.complex128)
    Fw[:n // 2] = F[:n // 2]
    Fw[-n // 2:] = F[-n // 2:]
    wide = np.fft.ifft(Fw) * ratio
    t = np.arange(wide.size, dtype=np.float64)
    return wide * np.exp(2j * np.pi * (offset_hz / wide_rate) * t)


def test_channelizer_roundtrip():
    """Up-convert the 6 PRB capture to an offset inside a 7.68M band;
    channelizing at that offset must recover a detectable signal."""
    iq, cell_id, _ = load_frame(6)
    wide = _upconvert(iq.astype(np.complex128), 7.68e6, 1.5e6)
    chans = channelize.channelize(wide.astype(np.complex64), 7.68e6,
                                  [0.0, 1.5e6])
    x = cplx.to_numpy((chans[0][1], chans[1][1]))
    from ltetrigger_tpu.ltecore import refrx
    power = refrx.pss_correlate(
        np.concatenate([x, x]).astype(np.complex128), cell_id % 3)
    pk, psr = refrx.peak_and_psr(power)
    assert psr > 4.0
    # the off-target channel must NOT contain the cell
    x0 = cplx.to_numpy((chans[0][0], chans[1][0]))
    _, psr0 = refrx.peak_and_psr(refrx.pss_correlate(
        np.concatenate([x0, x0]).astype(np.complex128), cell_id % 3))
    assert psr0 < 4.0


def test_wideband_scan_two_cells():
    """Two synthesized cells at different offsets in one 7.68M capture."""
    fa = synth.synthesize_frame(99, nof_prb_field=25)
    fb = synth.synthesize_frame(250, nof_prb_field=50)
    wide = (_upconvert(np.tile(fa, 2), 7.68e6, -2.4e6)
            + _upconvert(np.tile(fb, 2), 7.68e6, 2.4e6))
    wide = (wide / np.sqrt(np.mean(np.abs(wide) ** 2))).astype(np.complex64)

    out = wideband_scan(wide, 7.68e6, [-2.4e6, 0.0, 2.4e6], seconds=0.25)
    by_off = {r["center_offset_hz"]: r for r in out}
    assert by_off[-2.4e6]["detected"] and by_off[-2.4e6]["cell_id"] == 99
    assert by_off[2.4e6]["detected"] and by_off[2.4e6]["cell_id"] == 250
    assert by_off[-2.4e6]["nof_prb"] == 25
    assert by_off[2.4e6]["nof_prb"] == 50
    assert not by_off[0.0]["detected"]

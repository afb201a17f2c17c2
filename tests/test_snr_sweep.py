"""SNR-sweep harness test: detection must be monotone-ish — solid at high
SNR, absent far below the threshold (the measurement the reference only
offered as a GUI demo)."""

import numpy as np

from ltetrigger_tpu.apps.snr_sweep import snr_sweep
from tests.conftest import load_frame


def test_snr_sweep_curve():
    iq, cell_id, rate = load_frame(6)
    curve = snr_sweep(iq, rate, snrs_db=[-20, 0, 20], seconds=0.35)
    by_snr = {c["snr_db"]: c for c in curve}
    assert not by_snr[-20.0]["detected"]
    assert by_snr[20.0]["detected"]
    assert by_snr[20.0]["cell_id"] == cell_id
    # PSR should grow with SNR
    assert by_snr[20.0]["max_psr"] > by_snr[-20.0]["max_psr"]


def test_detection_knee_pinned():
    """The detection-SNR knee at the reference's default threshold 4 sits
    at -8 dB (measured curve committed in SNR_CURVE.md): detection holds at
    -8 dB and is gone by -14 dB.  Guards the BASELINE.md secondary metric
    against sensitivity regressions."""
    iq, cell_id, rate = load_frame(6)
    curve = snr_sweep(iq, rate, snrs_db=[-14, -8], seconds=0.5, seed=0)
    by_snr = {c["snr_db"]: c for c in curve}
    assert by_snr[-8.0]["detected"]
    assert by_snr[-8.0]["cell_id"] == cell_id
    assert not by_snr[-14.0]["detected"]

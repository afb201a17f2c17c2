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

#!/usr/bin/env python
"""Generate the committed detection-SNR curve artifact (SNR_CURVE.md +
snr_curve.json): detection probability vs SNR at PSR threshold 4, with and
without MIB soft-combining across the 40 ms PBCH TTI.

BASELINE.md secondary metric: the detection-SNR knee at the reference's
default threshold.  Run on the TPU (or CPU — the math is identical):

    python examples/make_snr_curve.py [--trials 8] [--step 2]
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--snr-min", type=float, default=-14)
    p.add_argument("--snr-max", type=float, default=-4)
    p.add_argument("--step", type=float, default=1)
    p.add_argument("--seconds", type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ltetrigger_tpu.apps.snr_sweep import snr_sweep

    iq = np.fromfile(
        "/root/reference/test_frames/lte_frame_6prb_cellid_123",
        dtype=np.complex64)
    snrs = np.arange(args.snr_min, args.snr_max + 1e-9, args.step)

    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.ones(8)))     # pay the first-D2H stall up front
    stall = time.perf_counter() - t0

    curves = {}
    for combine in (True, False):
        curves["combine" if combine else "single"] = snr_sweep(
            iq, 1.92e6, snrs, seconds=args.seconds, n_trials=args.trials,
            combine=combine)

    def knee(curve):
        """lowest SNR with prob >= 0.5 such that all higher SNRs detect."""
        best = None
        for rec in sorted(curve, key=lambda r: -r["snr_db"]):
            if rec["prob"] >= 0.5:
                best = rec["snr_db"]
            else:
                break
        return best

    payload = {
        "device": str(jax.devices()[0]),
        "capture": "lte_frame_6prb_cellid_123 (looped, unit signal power)",
        "psr_threshold": 4.0,
        "seconds_per_trial": args.seconds,
        "n_trials": args.trials,
        "knee_db": {k: knee(v) for k, v in curves.items()},
        "curves": curves,
    }
    with open("snr_curve.json", "w") as f:
        json.dump(payload, f, indent=2)

    lines = [
        "# Detection probability vs SNR (PSR threshold 4)",
        "",
        f"Device: {payload['device']}.  {args.trials} independent noise",
        f"realizations per point, {args.seconds} s of looped 6-PRB capture",
        "(cell 123) per trial, one batched device program per curve",
        "(apps/snr_sweep.py).  `combine` = MIB soft-combining across the",
        "40 ms PBCH TTI (reference parity is srslte_ue_mib_decode's 1-TTI",
        "buffer; this framework combines across up to 4 TTIs); `single` =",
        "stateless per-subframe decoding.",
        "",
        "| SNR (dB) | P(detect), combine | P(detect), single |",
        "|---|---|---|",
    ]
    cs = {r["snr_db"]: r for r in curves["combine"]}
    ss = {r["snr_db"]: r for r in curves["single"]}
    for snr in sorted(cs):
        lines.append(f"| {snr:g} | {cs[snr]['prob']:.2f} "
                     f"| {ss[snr]['prob']:.2f} |")
    lines += [
        "",
        f"Detection knee (lowest SNR with P >= 0.5, monotone above): "
        f"**{payload['knee_db']['combine']:g} dB** with combining, "
        f"**{payload['knee_db']['single']:g} dB** without.",
        "",
        "Interpretation: at the reference's default threshold the knee is",
        "set by PSS ACQUISITION (the PSR-threshold hysteresis gate), not by",
        "MIB decoding — whenever PSS tracks, even a single subframe decodes",
        "here, so TTI soft-combining does not move this end-to-end knee.",
        "Combining's sensitivity win is at the PBCH stage itself: with",
        "ideal sync it decodes MIB at -21 dB where every single-subframe",
        "attempt fails (tests/test_ops.py::TestPbch::",
        "test_tti_soft_combining_beats_single_subframe) — the regime that",
        "matters when PSS is aided (known cell, re-acquisition) or the",
        "PSR threshold is lowered toward its 1.5 floor.",
        "",
        f"(first-D2H stall paid before measurement: {stall:.0f} s; "
        "see BENCHNOTES.md)",
    ]
    with open("SNR_CURVE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate the committed detection-SNR curve artifact (SNR_CURVE.md +
snr_curve.json): detection probability vs SNR, combine vs single-subframe
MIB decoding, across the operating points where combining could matter
end-to-end (VERDICT r2 task 6):

  * PSR threshold 4 (reference default) and 1.5 (the documented floor,
    reference python/downlink_trigger_c.py:10 — "unstable" there);
  * AWGN and the default ETU-class frequency-selective fading profile.

    python examples/make_snr_curve.py [--trials 8] [--step 1]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def knee(curve):
    """Lowest SNR with prob >= 0.5 such that all higher SNRs also reach
    0.5 (monotone above)."""
    best = None
    for rec in sorted(curve, key=lambda r: -r["snr_db"]):
        if rec["prob"] >= 0.5:
            best = rec["snr_db"]
        else:
            break
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--snr-min", type=float, default=-16)
    p.add_argument("--snr-max", type=float, default=0)
    p.add_argument("--step", type=float, default=1)
    p.add_argument("--seconds", type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ltetrigger_tpu.apps.snr_sweep import snr_sweep
    from ltetrigger_tpu.ltecore.synth import default_port_channels

    iq = np.fromfile(
        "/root/reference/test_frames/lte_frame_6prb_cellid_123",
        dtype=np.complex64)
    snrs = np.arange(args.snr_min, args.snr_max + 1e-9, args.step)
    taps = default_port_channels(1)[0]

    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.ones(8)))     # pay the first-D2H stall up front
    stall = time.perf_counter() - t0

    configs = [
        ("awgn_t4", 4.0, None),
        ("awgn_t1.5", 1.5, None),
        ("fading_t4", 4.0, taps),
        ("fading_t1.5", 1.5, taps),
    ]
    curves = {}
    for name, thresh, ch in configs:
        for combine in (True, False):
            key = f"{name}_{'combine' if combine else 'single'}"
            curves[key] = snr_sweep(iq, 1.92e6, snrs, seconds=args.seconds,
                                    psr_threshold=thresh,
                                    n_trials=args.trials, combine=combine,
                                    channel_taps=ch)
            print(key, "knee:", knee(curves[key]), flush=True)

    # ---- the PBCH-LIMITED regime (VERDICT r4 #2): sync pinned at 0 dB,
    # ONLY the PBCH REs attenuated, 6 full TTIs of exposure — the regime
    # where TTI soft-combining CAN show a gain (the overall-SNR curves
    # above are acquisition-limited, so it cannot show there)
    from ltetrigger_tpu.apps.snr_sweep import pbch_sweep
    pbch_axis = list(np.arange(-36.0, -17.9, 1.5))
    pbch_curves = {}
    for combine in (True, False):
        key = f"pbch_{'combine' if combine else 'single'}"
        pbch_curves[key] = pbch_sweep(pbch_axis, n_ttis=6,
                                      n_trials=args.trials, combine=combine)
        k = knee([{"snr_db": r["pbch_rel_db"], "prob": r["prob"]}
                  for r in pbch_curves[key]])
        print(key, "knee:", k, flush=True)

    knees = {k: knee(v) for k, v in curves.items()}
    pbch_knees = {k: knee([{"snr_db": r["pbch_rel_db"], "prob": r["prob"]}
                           for r in v]) for k, v in pbch_curves.items()}
    payload = {
        "device": str(jax.devices()[0]),
        "capture": "lte_frame_6prb_cellid_123 (looped, unit signal power)",
        "seconds_per_trial": args.seconds,
        "n_trials": args.trials,
        "fading_taps": [[d, [g.real, g.imag]] for d, g in taps],
        "knee_db": knees,
        "curves": curves,
        "pbch_limited": {"knee_db": pbch_knees, "curves": pbch_curves,
                         "n_ttis": 6, "snr_sync_db": 0.0},
    }
    with open("snr_curve.json", "w") as f:
        json.dump(payload, f, indent=2)

    lines = [
        "# Detection probability vs SNR — combine vs single, AWGN vs fading",
        "",
        f"Device: {payload['device']}.  {args.trials} independent noise",
        f"realizations per point, {args.seconds} s of looped 6-PRB capture",
        "(cell 123) per trial, one batched device program per curve",
        "(apps/snr_sweep.py).  `combine` = MIB soft-combining across the",
        "40 ms PBCH TTI; `single` = stateless per-subframe decoding.",
        "Thresholds: 4 = reference default; 1.5 = the reference's documented",
        "floor (python/downlink_trigger_c.py:10).  Fading = static 3-tap",
        "ETU-class frequency-selective profile (ltecore/synth.py,",
        ">6 dB in-band ripple).",
        "",
    ]
    for name, thresh, ch in configs:
        ck, sk = f"{name}_combine", f"{name}_single"
        lines += [f"## {name}  (threshold {thresh:g}, "
                  f"{'fading' if ch else 'AWGN'})", "",
                  "| SNR (dB) | P(detect), combine | P(detect), single |",
                  "|---|---|---|"]
        cs = {r["snr_db"]: r for r in curves[ck]}
        ss = {r["snr_db"]: r for r in curves[sk]}
        for snr in sorted(cs):
            lines.append(f"| {snr:g} | {cs[snr]['prob']:.2f} "
                         f"| {ss[snr]['prob']:.2f} |")
        kc, ks = knees[ck], knees[sk]
        lines += ["", f"Knee: combine **{kc} dB**, single **{ks} dB**.", ""]

    lines += [
        "## pbch_limited  (sync at 0 dB, ONLY PBCH REs attenuated, "
        "6 TTIs)", "",
        "The regime the overall-SNR sweeps cannot reach: acquisition always",
        "succeeds (PSS/SSS/CRS at 0 dB) and the publish decision is purely",
        "the MIB decode.  Axis = PBCH RE level relative to nominal",
        "(apps/snr_sweep.py::pbch_sweep; quarters cycle the true 40 ms TTI",
        "sequence, payload advancing per TTI).", "",
        "| PBCH level (dB rel) | P(publish), combine | P(publish), single |",
        "|---|---|---|"]
    pc = {r["pbch_rel_db"]: r for r in pbch_curves["pbch_combine"]}
    ps = {r["pbch_rel_db"]: r for r in pbch_curves["pbch_single"]}
    for x in sorted(pc):
        lines.append(f"| {x:g} | {pc[x]['prob']:.2f} | {ps[x]['prob']:.2f} |")
    lines += ["", f"Knee: combine **{pbch_knees['pbch_combine']} dB**, "
              f"single **{pbch_knees['pbch_single']} dB** — the 40 ms",
              "soft-combiner buys "
              f"**{pbch_knees['pbch_single'] - pbch_knees['pbch_combine']:g}"
              " dB** of PBCH sensitivity once acquisition is not the",
              "bottleneck (tests/test_snr_sweep.py pins the separation at "
              "-27 dB).", ""]

    wins = [(n, knees[f"{n}_combine"], knees[f"{n}_single"])
            for n, _, _ in configs
            if knees[f"{n}_combine"] is not None
            and (knees[f"{n}_single"] is None
                 or knees[f"{n}_combine"] < knees[f"{n}_single"])]
    lines += ["## Interpretation", ""]
    if wins:
        for n, kc, ks in wins:
            lines.append(
                f"- **Combining wins end-to-end at `{n}`**: knee "
                f"{kc:g} dB vs {ks if ks is not None else 'no detection'} "
                "dB without combining.")
        lines.append("")
        lines.append("Where the knees are equal the limit is PSS "
                     "acquisition (the PSR hysteresis gate), not MIB "
                     "decoding — whenever PSS tracks, a single subframe "
                     "decodes.")
    else:
        lines += [
            "In the overall-SNR sweeps the combine and single knees are",
            "equal at every operating point — the end-to-end detection",
            "limit there is PSS acquisition (the PSR hysteresis gate), not",
            "MIB decoding; whenever PSS tracks, a single subframe decodes.",
            "The `pbch_limited` section above is the controlled regime",
            "where the decode IS the limit, and there the TTI soft-combiner",
            "shows its measured multi-dB gain — srsLTE's own 4-frame",
            "combining (reference lib/mib_impl.cc:75-76,162) exists for",
            "exactly this interference/coverage-limited case.",
        ]
    lines += ["", f"(first-D2H stall paid before measurement: {stall:.0f} s; "
              "see BENCHNOTES.md)"]
    with open("SNR_CURVE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()

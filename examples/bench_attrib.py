#!/usr/bin/env python
"""Attribute channel_scan step time across pipeline stages (VERDICT r2 #1).

Times a ladder of lax.scan bodies, each adding one stage of the real
trigger_step, under the exact bench conditions (C channels, device-resident
buffer, D2H fence).  The difference between consecutive rungs is that
stage's per-step cost.  Also times the full trigger_step scan (parity check
against bench.py) — the fused engine can beat the sum of rungs (XLA fuses
across stages) but large rung deltas still localize the cost.

Usage: python examples/bench_attrib.py [channels] [n_steps]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ltetrigger_tpu.ltecore.constants import (HALF_FRAME_LENGTH,
                                              PSS_SYMBOL_START, SLOT_LENGTH,
                                              SYMBOL_SZ)
from ltetrigger_tpu.models import trigger as trig
from ltetrigger_tpu.ops import cfo as cfo_ops
from ltetrigger_tpu.ops import cplx, correlate, sync

R = trig.R
LOOKBACK = trig.LOOKBACK
WINDOW = trig.WINDOW


def make_buffer(channels, seconds=0.55):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_sweep import make_buffer as mb
    return mb(channels, seconds)


def _gather(buffer, pos):
    start = jnp.clip(pos - LOOKBACK, 0, buffer[0].shape[0] - WINDOW)
    g = jax.vmap(lambda b, s: jax.lax.dynamic_slice(b, (s,), (WINDOW,)),
                 in_axes=(None, 0))
    return (g(buffer[0], start), g(buffer[1], start))


def _ladder_bodies():
    """name -> step(buffer, carry) -> (carry, out_scalar); carry is
    (pos [R], ema [R,9600])."""
    reps = tuple(jnp.asarray(a) for a in cfo_ops.replica_pairs())

    def b_gather(buffer, carry):
        pos, ema = carry
        w = _gather(buffer, pos)
        s = jnp.sum(w[0][:, ::512]) * 0  # consume a few lanes only
        return (pos + HALF_FRAME_LENGTH + s.astype(jnp.int32), ema), s

    def b_corr(buffer, carry):
        pos, ema = carry
        w = _gather(buffer, pos)
        srch = cplx.index(w, (slice(None),
                              slice(LOOKBACK, LOOKBACK + correlate.V2_WINDOW)))
        p = correlate.default_power_diag(srch)
        s = jnp.sum(p[:, ::512]) * 0
        return (pos + HALF_FRAME_LENGTH + s.astype(jnp.int32), ema), s

    def b_ema(buffer, carry):
        pos, ema = carry
        w = _gather(buffer, pos)
        srch = cplx.index(w, (slice(None),
                              slice(LOOKBACK, LOOKBACK + correlate.V2_WINDOW)))
        p = correlate.default_power_diag(srch)
        ema = 0.1 * p + 0.9 * ema
        s = jnp.sum(ema[:, ::512]) * 0
        return (pos + HALF_FRAME_LENGTH + s.astype(jnp.int32), ema), s

    def b_peak(buffer, carry):
        pos, ema = carry
        w = _gather(buffer, pos)
        srch = cplx.index(w, (slice(None),
                              slice(LOOKBACK, LOOKBACK + correlate.V2_WINDOW)))
        p = correlate.default_power_diag(srch)
        ema = 0.1 * p + 0.9 * ema
        peak, psr = correlate.peak_and_psr(ema)
        s = jnp.sum(psr) * 0
        return (pos + HALF_FRAME_LENGTH + s.astype(jnp.int32), ema), s

    def b_align(buffer, carry):
        pos, ema = carry
        w = _gather(buffer, pos)
        srch = cplx.index(w, (slice(None),
                              slice(LOOKBACK, LOOKBACK + correlate.V2_WINDOW)))
        p = correlate.default_power_diag(srch)
        ema = 0.1 * p + 0.9 * ema
        peak, psr = correlate.peak_and_psr(ema)
        fs = jnp.clip(peak - LOOKBACK, -LOOKBACK, 8767)
        sl = jax.vmap(lambda a, f: jax.lax.dynamic_slice(
            a, (LOOKBACK + f,), (2 * SLOT_LENGTH,)))
        aligned = (sl(w[0], fs), sl(w[1], fs))
        pss_sym = cplx.index(aligned, (slice(None),
                                       slice(PSS_SYMBOL_START, SLOT_LENGTH)))
        est = cfo_ops.cfo_estimate(pss_sym, reps)
        corr = cfo_ops.cfo_correct(aligned, -est / SYMBOL_SZ)
        s = (jnp.sum(corr[0][:, ::256]) + jnp.sum(psr)) * 0
        return (pos + HALF_FRAME_LENGTH + s.astype(jnp.int32), ema), s

    def b_sss(buffer, carry):
        pos, ema = carry
        w = _gather(buffer, pos)
        srch = cplx.index(w, (slice(None),
                              slice(LOOKBACK, LOOKBACK + correlate.V2_WINDOW)))
        p = correlate.default_power_diag(srch)
        ema = 0.1 * p + 0.9 * ema
        peak, psr = correlate.peak_and_psr(ema)
        fs = jnp.clip(peak - LOOKBACK, -LOOKBACK, 8767)
        sl = jax.vmap(lambda a, f: jax.lax.dynamic_slice(
            a, (LOOKBACK + f,), (2 * SLOT_LENGTH,)))
        aligned = (sl(w[0], fs), sl(w[1], fs))
        pss_sym = cplx.index(aligned, (slice(None),
                                       slice(PSS_SYMBOL_START, SLOT_LENGTH)))
        est = cfo_ops.cfo_estimate(pss_sym, reps)
        sf = cfo_ops.cfo_correct(aligned, -est / SYMBOL_SZ)
        ncp = sync.detect_cp(sf)
        nid2 = jnp.arange(R, dtype=jnp.int32)
        n1, sub5 = sync.sss_decode(sf, nid2, ncp)
        s = (jnp.sum(n1) + jnp.sum(psr)).astype(jnp.float32) * 0
        return (pos + HALF_FRAME_LENGTH + s.astype(jnp.int32), ema), s

    return [("gather", b_gather), ("corr", b_corr), ("ema", b_ema),
            ("peak_psr", b_peak), ("align_cfo", b_align), ("sss", b_sss)]


def time_scan(fn, buf, n_steps, iters=3):
    c = buf[0].shape[0]

    @jax.jit
    def run(buffer):
        pos0 = jnp.full((c, R), LOOKBACK, jnp.int32)
        ema0 = jnp.zeros((c, R, HALF_FRAME_LENGTH), jnp.float32)

        # vmap over channels: buffer lane c with per-channel carry
        def stepc(carry, _):
            pos, ema = carry

            def one(bufr, bufi, p, e):
                return fn((bufr, bufi), (p, e))

            (pos2, ema2), s = jax.vmap(one)(buffer[0], buffer[1], pos, ema)
            return (pos2, ema2), s

        (posf, emaf), ss = jax.lax.scan(stepc, (pos0, ema0), None,
                                        length=n_steps)
        return jnp.sum(posf)

    out = run(buf)
    _ = float(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(run(buf))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    _ = float(jnp.sum(jnp.ones(8)))
    buf = make_buffer(channels)
    jax.block_until_ready(buf)
    prev = 0.0
    for name, fn in _ladder_bodies():
        t = time_scan(fn, buf, n_steps)
        print(json.dumps({"stage": name,
                          "ms_per_step": round(t * 1e3 / n_steps, 3),
                          "delta_ms": round((t - prev) * 1e3 / n_steps, 3)}),
              flush=True)
        prev = t

    # full engine for parity with bench.py
    from ltetrigger_tpu.parallel import channel_scan
    final, out = channel_scan(buf, n_steps, 4.0)
    _ = float(jnp.sum(final.pos))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        final, out = channel_scan(buf, n_steps, 4.0)
        _ = float(jnp.sum(final.pos))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": "FULL_channel_scan",
                      "ms_per_step": round(best * 1e3 / n_steps, 3)}),
          flush=True)


if __name__ == "__main__":
    main()

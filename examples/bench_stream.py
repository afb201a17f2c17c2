#!/usr/bin/env python
"""Streaming-driver diagnosis: per-stage wall clock of Trigger.process.

Feeds the 6-PRB capture in 4-half-frame chunks (the live-SDR shape), twice
(pass 1 compiles, pass 2 is steady state), printing the driver's StageTimer
split (prep = host buffer work, scan = dispatch, drain = device->host) and
the dispatch-depth histogram.

Usage: python examples/bench_stream.py [seconds] [chunk_halfframes]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ltetrigger_tpu.ltecore.constants import HALF_FRAME_LENGTH
from ltetrigger_tpu.models.api import Trigger

FRAME_6PRB = "/root/reference/test_frames/lte_frame_6prb_cellid_123"


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    chunk_hf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    transports = sys.argv[3].split(",") if len(sys.argv) > 3 \
        else ["f32", "i16", "i8"]
    passes = int(os.environ.get("STREAM_PASSES", "5"))
    _ = float(jnp.sum(jnp.ones(8)))
    iq = np.fromfile(FRAME_6PRB, dtype=np.complex64)
    total = int(seconds * 1.92e6)
    sig = np.tile(iq, -(-total // iq.size))[:total]
    chunk = chunk_hf * HALF_FRAME_LENGTH

    for transport in transports:
        trg = Trigger(psr_threshold=4.0, transport=transport)
        best = 0.0
        for p in range(passes):
            trg.timer.reset()
            t0 = time.perf_counter()
            fed = 0
            for i in range(0, total, chunk):
                trg.process(sig[i:i + chunk])
                fed += min(chunk, total - i)
            trg.flush()
            dt = time.perf_counter() - t0
            best = max(best, fed / dt)
            print(json.dumps({
                "transport": transport, "pass": p,
                "sps": round(fed / dt, 1), "wall_s": round(dt, 2),
                "stages": {k: {kk: round(vv, 1) for kk, vv in v.items()}
                           for k, v in trg.timer.summary().items()},
            }), flush=True)
        ok = any(c.cell_id == 123 for c in trg.cellstore.cells())
        print(json.dumps({"transport": transport,
                          "best_sps": round(best, 1),
                          "detections_ok": ok}), flush=True)


if __name__ == "__main__":
    main()

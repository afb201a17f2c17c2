#!/usr/bin/env python
"""Micro-attribution of pass C (the _mib_postpass batch) at bench shapes.

Times, in isolation: the per-step slot-0 segment gather, the CFO rotation
transcendentals, the CFO-ring sequential scan, and the capture-chain scan.

Usage: python examples/bench_attrib5.py [channels] [steps]
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

from ltetrigger_tpu.models import trigger as trig
from ltetrigger_tpu.ops import cfo as cfo_ops

R = trig.R


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    _ = float(jnp.sum(jnp.ones(8)))
    rng = np.random.default_rng(0)
    n = 1_100_000
    buf = (jnp.asarray(rng.normal(size=(C, n)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(C, n)).astype(np.float32)))
    starts = jnp.asarray(
        rng.integers(0, n - 2000, size=(S, C, R)).astype(np.int32))
    jax.block_until_ready(buf)

    @jax.jit
    def gather(buf, st):
        return trig._gather_steps(buf, st, trig.SEG)

    t = timeit(gather, buf, starts)
    print(json.dumps({"op": "gather_seg", "ms": round(t * 1e3, 1)}),
          flush=True)

    seg = gather(buf, starts)
    freq = jnp.asarray(rng.normal(size=(S, C, R)).astype(np.float32)) * 1e-4

    @jax.jit
    def rot(seg, freq):
        return cfo_ops.cfo_rotate(seg, freq, trig.SEG_OFF)

    t = timeit(rot, seg, freq)
    print(json.dumps({"op": "cfo_rotate", "ms": round(t * 1e3, 1)}),
          flush=True)

    est = freq
    push = jnp.asarray(rng.integers(0, 2, size=(S, C, R)), bool)
    lost = jnp.zeros((S, C, R), bool)

    @jax.jit
    def rings(est, push, lost):
        def ring_step(carry, xs):
            ring, count = carry
            est_t, push_t, lost_t = xs
            ring = jnp.where(lost_t[..., None], 0.0, ring)
            count = jnp.where(lost_t, 0, count)
            ring = jnp.where(push_t[..., None],
                             trig._ring_push(ring, count, est_t), ring)
            count = count + push_t.astype(jnp.int32)
            return (ring, count), trig._ring_mean(ring, count)

        ring0 = jnp.zeros((C, R, 200), jnp.float32)
        cnt0 = jnp.zeros((C, R), jnp.int32)
        return jax.lax.scan(ring_step, (ring0, cnt0), (est, push, lost))

    t = timeit(rings, est, push, lost)
    print(json.dumps({"op": "cfo_ring_scan", "ms": round(t * 1e3, 1)}),
          flush=True)

    cell_id = jnp.asarray(rng.integers(0, 504, size=(S, C, R)), jnp.int32)

    @jax.jit
    def capture(push, lost, cell_id):
        class _S0:
            published = jnp.zeros((C, R), bool)
            pending_fresh = jnp.ones((C, R), bool)
            mib_cell = jnp.full((C, R), -1, jnp.int32)
        raw = trig.RawStepOutput(
            grid=jnp.zeros((S,), jnp.int32), active=jnp.ones((S,), bool),
            peak=jnp.zeros((S, C, R), jnp.int32),
            psr=jnp.zeros((S, C, R), jnp.float32),
            score=jnp.zeros((S, C, R), jnp.int32),
            tracking=push, emit=push, lost=lost,
            consumed=jnp.zeros((S, C, R), jnp.int32))
        return trig._capture_chain(_S0, raw, push, jnp.zeros((S, C, R), bool),
                                   cell_id, trig.K_CANDIDATES)

    t = timeit(capture, push, lost, cell_id)
    print(json.dumps({"op": "capture_chain", "ms": round(t * 1e3, 1)}),
          flush=True)

    from ltetrigger_tpu.ops import sync

    @jax.jit
    def cpsss(sf):
        ncp = sync.detect_cp(sf, end=trig.SEG)
        nid2 = jnp.arange(R, dtype=jnp.int32)
        return sync.sss_decode(sf, nid2, ncp, end=trig.SEG)

    t = timeit(cpsss, seg)
    print(json.dumps({"op": "cp_sss", "ms": round(t * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()

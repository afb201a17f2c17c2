#!/usr/bin/env python
"""Split full-engine step time: scan_pass (state machine) vs _mib_postpass.

Usage: python examples/bench_attrib2.py [channels] [n_steps]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_sweep import make_buffer
from ltetrigger_tpu.models import trigger as trig


def main():
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    _ = float(jnp.sum(jnp.ones(8)))
    buf = make_buffer(channels, 0.55)
    jax.block_until_ready(buf)
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (channels,) + x.shape),
        trig.init_state())

    def alive(tree):
        """Reduce every leaf so nothing is dead-code-eliminated."""
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    @jax.jit
    def scan_only(buffers, sts):
        finals, raws = trig.scan_pass(buffers, sts, n_steps,
                                      jnp.float32(4.0),
                                      grid0_static=trig.LOOKBACK)
        return alive((finals, raws))

    def full_fn(decode):
        @jax.jit
        def full(buffers, sts):
            f, raw = trig.scan_pass(buffers, sts, n_steps, jnp.float32(4.0),
                                    grid0_static=trig.LOOKBACK)
            finals, outs = trig._mib_postpass(
                sts, f, raw, buffers, do_decode=jnp.asarray(decode))
            return alive((finals, outs))
        return full

    for name, fn in [("scan_pass_only", scan_only),
                     ("scan+post_nodecode", full_fn(False)),
                     ("scan+post_decode", full_fn(True))]:
        out = fn(buf, states)
        _ = float(jnp.sum(out))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(buf, states)))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": name,
                          "ms_per_dispatch": round(best * 1e3, 1),
                          "ms_per_step": round(best * 1e3 / n_steps, 3)}),
              flush=True)


if __name__ == "__main__":
    main()

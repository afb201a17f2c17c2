#!/usr/bin/env python
"""Attribute the MIB postpass decode cost (664 ms/dispatch at C=128).

Times each stage of _decode_candidates in isolation at the bench shapes
(C channels x K=16 candidates x R=3 roots): the PBCH front-end
(quarter_llrs_both_cp), the TTI combining chain, the 12-hypothesis codeword
search (Viterbi + CRC), and the raw wrap-around Viterbi.

Usage: python examples/bench_attrib3.py [channels]
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
from ltetrigger_tpu.ops import pbch
from ltetrigger_tpu.ops.viterbi import viterbi_decode_wa

R, K = trig.R, trig.K_CANDIDATES


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)
                         if not isinstance(x, jnp.ndarray) else
                         jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = fence(out)
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    _ = float(jnp.sum(jnp.ones(8)))
    rng = np.random.default_rng(0)

    # --- PBCH front-end: [C*K*R] slot-1 candidates, both CPs ---
    slot1 = (jnp.asarray(rng.normal(size=(C * K * R, 960)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(C * K * R, 960)).astype(np.float32)))
    cells = jnp.asarray(rng.integers(0, 504, size=(C * K * R,)), jnp.int32)

    @jax.jit
    def front(s, c):
        return jax.vmap(pbch.quarter_llrs_both_cp)(s, c)

    t = timeit(front, slot1, cells)
    print(json.dumps({"stage": "pbch_front_both_cp",
                      "batch": C * K * R, "ms": round(t * 1e3, 1)}),
          flush=True)

    # --- codeword search (Viterbi + CRC + unpack): [C*K*R, 12, 120] ---
    llrs = jnp.asarray(rng.normal(size=(C * K * R, 12, 120)).astype(np.float32))
    qof = jnp.tile(jnp.arange(12, dtype=jnp.int32) % 4, (C * K * R, 1))

    @jax.jit
    def search(l, q):
        return jax.vmap(pbch.search_and_unpack)(l, q)

    t = timeit(search, llrs, qof)
    print(json.dumps({"stage": "search_and_unpack",
                      "batch": C * K * R, "ms": round(t * 1e3, 1)}),
          flush=True)

    # --- raw Viterbi at the flattened batch ---
    r = jnp.asarray(rng.normal(size=(C * K * R * 12, 40, 3)).astype(np.float32))

    @jax.jit
    def vit(x):
        return viterbi_decode_wa(x)

    t = timeit(vit, r)
    print(json.dumps({"stage": "viterbi_wa", "batch": C * K * R * 12,
                      "ms": round(t * 1e3, 1)}), flush=True)

    # --- TTI chain: emulate _decode_candidates step 2 shapes ---
    contrib = jnp.asarray(
        rng.normal(size=(C, R, K, 3, 4, 120)).astype(np.float32))
    fresh = jnp.asarray(rng.integers(0, 2, size=(C, R, K)), bool)
    cellsk = jnp.asarray(rng.integers(0, 504, size=(C, R, K)), jnp.int32)
    valid = jnp.ones((C, R, K), bool)

    @jax.jit
    def chain(contrib, fresh, cells, valid):
        def one(carry, xs):
            acc, n, cell = carry
            c_k, f_k, cl_k, v_k = xs
            restart = f_k | (cl_k != cell)
            n_k = jnp.where(restart, 0, n)
            q = jnp.mod(n_k[..., None] + jnp.arange(4, dtype=jnp.int32), 4)
            sel = jnp.take_along_axis(c_k, q[..., None, :, None], axis=-2)
            acc_new = jnp.where((q == 0)[..., None, :, None], sel, acc + sel)
            acc_out = jnp.where(v_k[..., None, None, None], acc_new, acc)
            return (acc_out, jnp.where(v_k, n_k + 1, n),
                    jnp.where(v_k, cl_k, cell)), acc_out

        acc0 = jnp.zeros((C, R, 3, 4, 120), jnp.float32)
        n0 = jnp.zeros((C, R), jnp.int32)
        cl0 = jnp.full((C, R), -1, jnp.int32)
        xs = (jnp.moveaxis(contrib, 2, 0), jnp.moveaxis(fresh, 2, 0),
              jnp.moveaxis(cells, 2, 0), jnp.moveaxis(valid, 2, 0))
        return jax.lax.scan(one, (acc0, n0, cl0), xs)

    t = timeit(chain, contrib, fresh, cellsk, valid)
    print(json.dumps({"stage": "tti_chain", "ms": round(t * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()

"""Pinpoint where the GMRES basis (ortho) time goes at large n.

PROBE_GMRES.json round 5: at 819.2k cells the Gram-Schmidt/basis share is
9.9 of 15.2 ms per iteration — far above the ~0.8 ms one blocked-MGS
traversal of the filled rows should cost. Candidates: XLA copying the
(mpad, n) basis carried through the while_loop (per-iteration
double-buffering), a copy inserted for the `V.at[j+1].set` row append,
and serialized dispatch of the 8-row dynamic-slice blocks. This probe
times MINIMAL while_loop bodies that each isolate one mechanism, on the
same (mpad, n) shapes as the real solver:

  append   V.at[j+1].set(w) only              -> carry/copy cost of the append
  read     one blocked-MGS pass, no append    -> pure basis-read cost
  mgs      read + append (the real body core) -> interaction
  cgs      dense masked V@w + V.T@h (classic) -> the pre-r4 path for reference

Usage: python scripts/probe_ortho.py --cells 819200 [--m 90]
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=819200)
    ap.add_argument("--m", type=int, default=90)
    ap.add_argument("--iters", type=int, default=45,
                    help="loop iterations per timed run (the filled-row "
                         "count grows 1..iters, like a real cycle)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fvens_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from fvens_tpu.solver.linear import _mgs_pass, _ROW_BLOCK

    n = args.cells * 4
    m = args.m
    mpad = -(-(m + 1) // _ROW_BLOCK) * _ROW_BLOCK
    dtype = jnp.float32
    ar = lambda x: x

    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, (n,), dtype)

    def run_loop(body):
        def f(w):
            V = jnp.zeros((mpad, n), dtype).at[0].set(w / jnp.linalg.norm(w))

            def cond(c):
                return c[2] < args.iters

            def wrapped(c):
                V, w, j = c
                V, w = body(V, w, j)
                # force a genuine per-iteration data dependency on the
                # updated basis: without this read XLA elided the whole
                # append chain (first runs timed 0.002 ms/iter — a
                # physically impossible number at (96, 3.28M))
                w = w + 1e-30 * V[(j * 7 + 3) % mpad]
                return (V, w, j + 1)

            V, w, j = jax.lax.while_loop(cond, wrapped, (V, w, 0))
            # consume ALL of V: returning a single row lets XLA dead-code
            # eliminate every other row's append (measured: the loop
            # collapsed to one write and timed 0.003 ms/iter)
            return V.sum() + w.sum()
        return jax.jit(f)

    def body_append(V, w, j):
        return V.at[j + 1].set(w), w * 0.999

    def body_append_rowset(V, w, j):
        from fvens_tpu.solver.pallas_banded import row_set
        return row_set(V, w, j + 1), w * 0.999

    def body_mgs_rowset(V, w, j):
        from fvens_tpu.solver.pallas_banded import row_set
        h, w2 = _mgs_pass(V, w, j + 1, ar)
        hn = jnp.sqrt(jnp.sum(w2 * w2))
        return row_set(V, w2 / jnp.maximum(hn, 1e-30), j + 1), w2

    def body_read(V, w, j):
        h, w2 = _mgs_pass(V, w, j + 1, ar)
        return V, w2 + 1e-20 * h[0]

    def body_mgs(V, w, j):
        h, w2 = _mgs_pass(V, w, j + 1, ar)
        hn = jnp.sqrt(jnp.sum(w2 * w2))
        return V.at[j + 1].set(w2 / jnp.maximum(hn, 1e-30)), w2

    def body_cgs(V, w, j):
        mask = (jnp.arange(mpad) <= j).astype(dtype)
        h = (V @ w) * mask
        w2 = w - V.T @ h
        hn = jnp.sqrt(jnp.sum(w2 * w2))
        return V.at[j + 1].set(w2 / jnp.maximum(hn, 1e-30)), w2

    out = {"cells": args.cells, "n": n, "m": m, "iters": args.iters}
    variants = [("append", body_append), ("read", body_read),
                ("mgs", body_mgs), ("cgs", body_cgs)]
    if jax.devices()[0].platform == "tpu" and n % 128 == 0:
        variants += [("append_rowset", body_append_rowset),
                     ("mgs_rowset", body_mgs_rowset)]
    for name, body in variants:
        f = run_loop(body)
        jax.block_until_ready(f(w0))            # compile
        t0 = time.perf_counter()
        jax.block_until_ready(f(w0))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        out[f"{name}_ms_per_iter"] = ms
        print(f"# {name}: {ms:.4f} ms/iter", flush=True)
    import jax as _j
    out["platform"] = _j.devices()[0].platform
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

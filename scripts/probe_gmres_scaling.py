"""Isolate the per-Krylov-iteration cost anomaly at large mesh sizes.

BENCH_NOTES round 4: the 819.2k-cell solve costs ~189 ms per Krylov
iteration vs ~15.4 ms at 204.8k (12x for 4x the cells) — far above the
banded operator's HBM streaming model. This probe times the three
candidate components SEPARATELY on real assembled Jacobians so round-5
work targets the right one:

  matvec   banded matvec applied R times back-to-back (one jit program)
  pc       banded bsgs x sweeps applied R times
  gmres    one full gmres(restart) call at fixed iteration count

Each timing is one device program (lax.fori_loop over applies), so the
host/tunnel round trip is excluded. Usage:

    python scripts/probe_gmres_scaling.py --sizes 320x160 640x320 1280x640
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
    ap.add_argument("--sizes", nargs="+", default=["640x320", "1280x640"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--restart", type=int, default=90)
    ap.add_argument("--sweeps", type=int, default=6)
    ap.add_argument("--classic", action="store_true",
                    help="force the classic CGS2 gmres basis path "
                         "(blocked=False) for before/after A-B records")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fvens_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scripts.bench_bigmesh import build_case
    from fvens_tpu.cases.casesolvers import build_space, initial_state
    from fvens_tpu.solver import jacobian as jacmod
    from fvens_tpu.solver.banded import (banded_dn_blocks, banded_structure,
                                         make_banded_bsgs,
                                         make_banded_matvec, banded_blocks)
    from fvens_tpu.solver.linear import block_jacobi_inverse, gmres

    for size in args.sizes:
        ni, nj = (int(x) for x in size.split("x"))
        case, mesh, u0 = build_case(ni, nj, platform=args.platform)
        space = build_space(case.cfg)
        bl = banded_structure(mesh)
        assert bl is not None
        mesh32 = mesh.astype(jnp.float32)
        u32 = u0.astype(jnp.float32)

        @jax.jit
        def setup(m, u):
            rhs, dt = space.compute_residual(m, u, True)
            jac = space.assemble_jacobian(m, u)
            jac = jacmod.add_pseudotime_term(m, jac, 500.0, dt)
            return rhs.astype(jnp.float32), jac

        rhs, jac = setup(mesh32, u32)
        jax.block_until_ready(rhs)

        # big operands enter as jit ARGUMENTS, not closures: closed-over
        # constants are embedded in the compile request, and at 819.2k
        # cells the 315 MB banded operand blows the axon remote-compile
        # body limit (HTTP 413) — same rule as mesh-as-jit-argument in
        # the real solver
        Bt = jax.jit(banded_blocks)(bl, jac.N)
        Dinv = jax.jit(block_jacobi_inverse)(jac.D)
        DNbt = jax.jit(banded_dn_blocks)(bl, Dinv, jac.N)
        offsets = bl.offsets
        # free dead device buffers before the big allocations: the slot
        # Jacobian N (210 MB at 819k) is superseded by Bt/DNbt, and the f64
        # mesh/state used only for assembly (HBM headroom at 819.2k cells)
        D = jac.D
        del jac
        u0 = u32 = None
        jax.block_until_ready((Bt, DNbt))
        print(f"# {size}: setup done, {len(offsets)} bands", flush=True)

        @jax.jit
        def run_mv(x, D, B):
            mv = make_banded_matvec(D, B, offsets)
            return jax.lax.fori_loop(0, args.reps, lambda i, v: mv(v), x)

        @jax.jit
        def run_pc(x, Di, DN):
            pc = make_banded_bsgs(Di, DN, offsets, args.sweeps)
            return jax.lax.fori_loop(0, args.reps, lambda i, v: pc(v), x)

        out = {"size": size, "cells": mesh.n_cells, "reps": args.reps,
               "restart": args.restart, "sweeps": args.sweeps,
               "gmres_path": "classic" if args.classic else "auto",
               "platform": jax.devices()[0].platform}
        for name, run, ops in (("matvec", run_mv, (D, Bt)),
                               ("pc", run_pc, (Dinv, DNbt))):
            jax.block_until_ready(run(rhs, *ops))          # compile
            t0 = time.perf_counter()
            jax.block_until_ready(run(rhs, *ops))
            out[f"{name}_ms_per_apply"] = (
                (time.perf_counter() - t0) / args.reps * 1e3)
            print(f"# {size}: {name} done", flush=True)

        @jax.jit
        def one_solve(b, D, B, Di, DN):
            mv = make_banded_matvec(D, B, offsets)
            pc = make_banded_bsgs(Di, DN, offsets, args.sweeps)
            x, iters, relres = gmres(mv, b, jnp.zeros_like(b), pc,
                                     restart=args.restart,
                                     maxiter=args.restart, rtol=1e-30,
                                     blocked=False if args.classic else None)
            return x, iters, relres

        ops = (D, Bt, Dinv, DNbt)
        jax.block_until_ready(one_solve(rhs, *ops))      # compile
        t0 = time.perf_counter()
        x, iters, relres = one_solve(rhs, *ops)
        jax.block_until_ready(x)
        gm = time.perf_counter() - t0
        out["gmres_iters"] = int(iters)
        out["gmres_ms_per_iter"] = gm / max(int(iters), 1) * 1e3
        out["ortho_ms_per_iter"] = (
            out["gmres_ms_per_iter"] - out["matvec_ms_per_apply"]
            - out["pc_ms_per_apply"])
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

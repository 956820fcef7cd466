"""Re-measure the CPU stand-in baseline for bench.py.

Runs the exact bench solve (visc-naca0012, implicit, absolute-1e-10 stop)
on the host CPU in full f64 — the configuration recorded as
CPU_BASELINE_WALL in bench.py. Run on an otherwise idle box:

    python scripts/measure_cpu_baseline.py [--pc bcsgs] [--mixed]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pc", default="bcsgs")
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--mixed", action="store_true",
                    help="mixed f32 Krylov (default: full f64)")
    args = ap.parse_args()

    from bench import run_solve
    import jax
    solve, mesh = run_solve(platform="cpu", mixed=args.mixed, pc=args.pc,
                            sweeps=args.sweeps)

    t0 = time.perf_counter()
    u, steps, lin_iters = solve()
    jax.block_until_ready(u)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cpu_baseline_wall_incl_compile": wall, "steps": steps,
        "lin_iters": lin_iters, "cells": mesh.n_cells,
        "pc": args.pc, "sweeps": args.sweeps, "mixed": args.mixed,
    }))

    # second run: compiled-cache wall (the number bench.py compares against)
    t0 = time.perf_counter()
    u, steps, lin_iters = solve()
    jax.block_until_ready(u)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cpu_baseline_wall": wall, "steps": steps,
        "lin_iters": lin_iters, "cells": mesh.n_cells,
        "pc": args.pc, "sweeps": args.sweeps, "mixed": args.mixed,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

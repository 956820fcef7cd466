"""Re-measure the CPU stand-in baseline for bench.py.

Runs the exact bench solve (visc-naca0012, implicit, absolute-1e-10 stop)
on the host CPU in full f64 — the configuration recorded as
CPU_BASELINE_WALL in bench.py. Run on an otherwise idle box:

    python scripts/measure_cpu_baseline.py [--pc bcsgs] [--mixed]
"""

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pc", default="bcsgs")
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--mixed", action="store_true",
                    help="mixed f32 Krylov (default: full f64)")
    ap.add_argument("--out", default=os.path.join(_ROOT, "BASELINE_CPU.json"),
                    help="artifact consumed by bench.py (vs_baseline source)")
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
    try:
        rev = subprocess.run(["git", "-C", _ROOT, "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    except Exception:
        rev = "unknown"
    record = {
        "cpu_baseline_wall": wall, "steps": steps,
        "lin_iters": lin_iters, "cells": mesh.n_cells,
        "pc": args.pc, "sweeps": args.sweeps, "mixed": args.mixed,
        "git_rev": rev, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_host_cpus": os.cpu_count(),
    }
    print(json.dumps(record))
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

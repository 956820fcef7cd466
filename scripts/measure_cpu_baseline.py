"""Re-measure the CPU stand-in baseline artifact consumed by bench.py.

Runs the exact bench solve (visc-naca0012, implicit, absolute-1e-10 stop)
on the host CPU in TWO configurations and writes BASELINE_CPU.json:

  - f64 (``cpu_baseline_wall``): full-double solve, the stand-in for the
    all-f64 reference FVENS (PETSc doubles throughout) — the denominator
    of bench.py's headline ``vs_baseline``;
  - mixed (``cpu_best_wall``): f32 Krylov inside the f64 loop, this
    framework's own best CPU configuration — the denominator of
    ``vs_cpu_best`` (framework-vs-itself across platforms).

Run on an otherwise idle box (single-vCPU host: never concurrently with
other heavy jobs):

    python scripts/measure_cpu_baseline.py [--pc bsgs] [--sweeps 6]
"""

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _timed_solve(mixed, pc, sweeps, two_phase=0.0):
    from bench import run_solve
    import jax
    solve, mesh = run_solve(platform="cpu", mixed=mixed, pc=pc,
                            sweeps=sweeps, two_phase=two_phase)
    # warmup run: triggers compilation (bench.py excludes compile the same
    # way); second run is the recorded number
    u, steps, lin_iters = solve()
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    u, steps, lin_iters = solve()
    jax.block_until_ready(u)
    wall = time.perf_counter() - t0
    return wall, steps, lin_iters, mesh.n_cells


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pc", default="bsgs")
    ap.add_argument("--sweeps", type=int, default=6)
    ap.add_argument("--skip-f64", action="store_true")
    ap.add_argument("--skip-mixed", action="store_true")
    ap.add_argument("--out", default=os.path.join(_ROOT, "BASELINE_CPU.json"),
                    help="artifact consumed by bench.py (vs_baseline source)")
    args = ap.parse_args()

    try:
        rev = subprocess.run(["git", "-C", _ROOT, "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    except Exception:
        rev = "unknown"
    record = {
        "pc": args.pc, "sweeps": args.sweeps, "git_rev": rev,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_host_cpus": os.cpu_count(),
    }
    # start from the existing artifact so one config can be re-measured
    # without discarding the other
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        for key in ("cpu_baseline_wall", "cpu_baseline_steps",
                    "cpu_best_wall", "cpu_best_steps", "cells"):
            if key in old:
                record[key] = old[key]

    if not args.skip_f64:
        wall, steps, iters, cells = _timed_solve(False, args.pc, args.sweeps)
        record.update(cpu_baseline_wall=wall, cpu_baseline_steps=steps,
                      cpu_baseline_lin_iters=iters, cells=cells)
        print(json.dumps({"config": "f64", "wall": wall, "steps": steps,
                          "lin_iters": iters}))
    if not args.skip_mixed:
        # our best CPU config: two-phase precision scheduling (f32 phase
        # to abs 1e-3, then mixed-f64 endgame) — bench.py run_solve
        wall, steps, iters, cells = _timed_solve(True, args.pc, args.sweeps,
                                                 two_phase=1e-3)
        record.update(cpu_best_wall=wall, cpu_best_steps=steps,
                      cpu_best_lin_iters=iters, cells=cells,
                      cpu_best_two_phase=1e-3)
        print(json.dumps({"config": "mixed+two-phase", "wall": wall,
                          "steps": steps, "lin_iters": iters}))

    print(json.dumps(record))
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

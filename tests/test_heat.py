"""Heat-equation (scalar diffusion) grid convergence.

Mirrors the reference heat tests (tests/heat/heat_steady.cpp:93-263):
steady Laplace problem with a manufactured sinusoidal solution; the L2 error
order must lie in [1.9, 2.1], on triangles and quads, implicit and explicit.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.config import (BCSpec, LinearSolverConfig,
                              NonlinearUpdateConfig, PseudoTimeConfig)
from fvens_tpu.fv.diffusion import DiffusionFV
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import unit_square
from fvens_tpu.solver.steady import SteadyBackwardEuler, SteadyForwardEuler


def exact(xy):
    return np.sin(2 * math.pi * xy[:, 0]) * np.sin(2 * math.pi * xy[:, 1])


def source(xy):
    return (8.0 * math.pi ** 2 * jnp.sin(2 * math.pi * xy[:, 0])
            * jnp.sin(2 * math.pi * xy[:, 1]))[:, None]


def solve_one(n, tri, implicit=True):
    md = unit_square(n, tri=tri)
    cm = compile_mesh(md, [BCSpec(marker=1, type="dirichlet", values=(0.0,))])
    space = DiffusionFV(diffusivity=1.0, source=source)
    if implicit:
        solver = SteadyBackwardEuler(
            space,
            PseudoTimeConfig(cfl_init=1e4, cfl_fin=1e4, tol=1e-9, maxiter=300),
            LinearSolverConfig(maxiter=60, restart=60, rtol=1e-4),
            NonlinearUpdateConfig(scheme="full"))
    else:
        # explicit heat CFL 0.1 (reference tests/heat/explls_quad.octrl)
        solver = SteadyForwardEuler(
            space, PseudoTimeConfig(cfl_init=0.1, cfl_fin=0.25, tol=1e-7,
                                    maxiter=20000))
    u, info = solver.solve(cm, jnp.zeros((cm.NC, 1)))
    rc = np.asarray(cm.rc)[: cm.n_cells]
    err = np.asarray(u)[: cm.n_cells, 0] - exact(rc)
    area = np.asarray(cm.area)[: cm.n_cells]
    return float(np.sqrt((err ** 2 * area).sum()))


@pytest.mark.parametrize("tri", [True, False])
def test_heat_implicit_convergence_order(tri):
    errs = [solve_one(n, tri) for n in (8, 16, 32)]
    order = math.log2(errs[-2] / errs[-1])
    assert 1.9 <= order <= 2.1, f"diffusion order {order} outside [1.9,2.1]"


def test_heat_explicit_matches_implicit():
    """Explicit pseudo-time must reach the same steady solution.

    On quads, as the reference's explicit heat tests (explls_quad.octrl) —
    triangle meshes need a smaller explicit CFL than the h^2/nu step allows.
    """
    e_imp = solve_one(8, False, implicit=True)
    e_exp = solve_one(8, False, implicit=False)
    assert abs(e_imp - e_exp) < 5e-4 * max(e_imp, 1e-10)

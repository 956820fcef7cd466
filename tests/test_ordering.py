"""Line detection / ordering golden tests and the bline line-implicit
preconditioner.

Goldens are the reference's committed files (tests/mesh/CMakeLists.txt:35-56,
threshold 10.0 on tests/common-input/testanisotropic.msh):

  - testanisotropic-lines.txt            (tests/mesh/testlineordering.cpp)
  - testanisotropic-lineordering.txt     (hybrid ordering, natural graph)
  - testanisotropic-line_rcm_ordering.txt (hybrid ordering, PETSc RCM graph)

Golden cell ids are written as cell + nbface + 1 (gmsh element numbering).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.config import BCSpec
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import cylinder_omesh
from fvens_tpu.mesh.ordering import (find_lines, hybrid_line_ordering,
                                     line_ordering)

ANISO_MESH = "tests/common-input/testanisotropic.msh"
BCS = [BCSpec(marker=2, type="slipwall"), BCSpec(marker=4, type="farfield")]


def _read_ints(path):
    return [int(t) for t in path.read_text().split()]


def test_find_lines_golden(refdir):
    from fvens_tpu.mesh.reader import read_mesh
    md = read_mesh(str(refdir / ANISO_MESH))
    lines, celline = find_lines(md, 10.0)
    golden = [[int(t) for t in ln.split()] for ln in
              (refdir / "tests/common-input/testanisotropic-lines.txt"
               ).read_text().splitlines() if ln.strip()]
    got = [[c + md.nbface + 1 for c in line] for line in lines]
    assert got == golden
    # celline consistency
    for li, line in enumerate(lines):
        for c in line:
            assert celline[c] == li


def test_line_ordering_golden(refdir):
    from fvens_tpu.mesh.reader import read_mesh
    md = read_mesh(str(refdir / ANISO_MESH))
    golden = _read_ints(
        refdir / "tests/common-input/testanisotropic-lineordering.txt")
    got = [c + md.nbface + 1 for c in line_ordering(md, 10.0)]
    assert got == golden
    # lineReorder and the natural-graph hybrid ordering coincide
    got_nat = [c + md.nbface + 1
               for c in hybrid_line_ordering(md, 10.0, "natural")]
    assert got_nat == golden


def test_hybrid_line_rcm_ordering_golden(refdir):
    from fvens_tpu.mesh.reader import read_mesh
    md = read_mesh(str(refdir / ANISO_MESH))
    golden = _read_ints(
        refdir / "tests/common-input/testanisotropic-line_rcm_ordering.txt")
    got = [c + md.nbface + 1 for c in hybrid_line_ordering(md, 10.0, "rcm")]
    assert got == golden


def _stretched_jacobian():
    """First-order Jacobian + pseudo-time term on a strongly radially
    stretched O-mesh (boundary-layer-like anisotropy)."""
    from fvens_tpu.config import NumericsConfig, PhysicsConfig
    from fvens_tpu.fv.residual import FlowFV
    from fvens_tpu.physics import GasPhysics
    from fvens_tpu.solver import jacobian as jacmod

    md = cylinder_omesh(48, 24, stretch=1.35)
    mesh = compile_mesh(md, BCS)
    pcfg = PhysicsConfig(Minf=0.38, viscous=False)
    ncfg = NumericsConfig(flux="ROE", gradient="NONE",
                          reconstruction="NONE", order2=False)
    phy = GasPhysics(g=pcfg.gamma, Minf=pcfg.Minf, Tinf=pcfg.Tinf,
                     Reinf=pcfg.Reinf, Pr=pcfg.Pr)
    space = FlowFV(phy=phy, pcfg=pcfg, ncfg=ncfg)
    u = jnp.tile(space.uinf, (mesh.NC, 1))
    rhs, dt = space.compute_residual(mesh, u, True)
    jac = space.assemble_jacobian(mesh, u)
    jac = jacmod.add_pseudotime_term(mesh, jac, jnp.asarray(200.0), dt)
    return mesh, jac, rhs


def test_bline_solves_and_beats_bjacobi():
    """pc='bline' must (a) produce a correct solve and (b) need fewer
    Krylov iterations than block-Jacobi on an anisotropic mesh — the
    whole point of the line-implicit smoother (reference analogue: ILU0
    strength on line-ordered meshes, testcases/defaults.solverc)."""
    from fvens_tpu.solver.linear import bsr_matvec, gmres, make_preconditioner
    from fvens_tpu.solver.lines import lines_from_mesh

    mesh, jac, rhs = _stretched_jacobian()
    matvec = lambda x: bsr_matvec(mesh, jac, x)
    b = rhs

    iters = {}
    sols = {}
    lines = lines_from_mesh(mesh)
    # sanity: on this stretched mesh, real multi-cell lines must exist
    assert int((np.asarray(lines.line_mask).sum(1) > 1).sum()) > 16
    for pc_kind in ("bjacobi", "bline"):
        pc = make_preconditioner(mesh, jac, pc_kind, sweeps=1,
                                 lines=lines if pc_kind == "bline" else None)
        x, its, rel = gmres(matvec, b, jnp.zeros_like(b), pc,
                            restart=60, maxiter=360, rtol=1e-6)
        iters[pc_kind] = int(its)
        sols[pc_kind] = np.asarray(x)
        # converged, and the returned x really solves the system
        assert float(rel) <= 1e-6
        res = np.asarray(matvec(x) - b)
        assert (np.linalg.norm(res)
                <= 2e-6 * max(np.linalg.norm(np.asarray(b)), 1e-30))
    # both solve the (mildly ill-conditioned) system; agreement is only as
    # tight as the Krylov tolerance allows
    assert (np.linalg.norm(sols["bline"] - sols["bjacobi"])
            <= 1e-2 * np.linalg.norm(sols["bjacobi"]))
    assert iters["bline"] < iters["bjacobi"], iters


def test_bline_exact_on_pure_line_system():
    """With all off-line coupling removed, one bline sweep IS the exact
    solve (batched block-tridiagonal Thomas)."""
    from fvens_tpu.solver.linear import (BlockJacobian, bsr_matvec,
                                         make_preconditioner)
    from fvens_tpu.solver.lines import lines_from_mesh

    mesh, jac, rhs = _stretched_jacobian()
    lines = lines_from_mesh(mesh)
    # zero every neighbour block that is not on a line tridiagonal
    N_line = jac.N * lines.line_slot_mask[..., None, None]
    jac2 = BlockJacobian(D=jac.D, N=N_line)
    pc = make_preconditioner(mesh, jac2, "bline", sweeps=1, lines=lines)
    x = pc(rhs)
    res = np.asarray(bsr_matvec(mesh, jac2, x) - rhs)
    nb = np.linalg.norm(np.asarray(rhs))
    assert np.linalg.norm(res) <= 1e-10 * nb

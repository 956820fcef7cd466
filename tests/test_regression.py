"""Functional regression tests against the reference's committed values.

Mirrors FVENS's e_testflow regression (tests/flow_solve.cpp + golden files
testcases/*/regr-*.txt): run a full case on the reference's own mesh and
compare (CL, CDp, CDsf). The reference gates at 1e-8 against its own
binaries; across an independent implementation the discretization-identical
values agree to the nonlinear solve tolerance — we gate at 1e-6 per
BASELINE.md.
"""

import pytest

from fvens_tpu.io_config import parse_control_file
from fvens_tpu.cases import SteadyFlowCase
from fvens_tpu.cases.casesolvers import load_case_mesh


@pytest.mark.slow
def test_visc_naca0012_regression(refdir):
    """Laminar NACA0012, Roe + WLS, implicit (the BASELINE.md north star).
    Golden: testcases/visc-naca0012/regr-LeastSquares_Roe.txt."""
    cfg = parse_control_file(
        str(refdir / "testcases/visc-naca0012/laminar-implicit.ctrl"))
    mesh = load_case_mesh(
        cfg, str(refdir / "testcases/visc-naca0012/grids/"
                          "NACA0012_lam_hybrid_1.msh"))
    case = SteadyFlowCase(cfg)
    u, info, fnls = case.run_output(mesh)
    assert info.converged
    ref_CL = 3.1542315562868e-05
    ref_CDp = 0.0111665585911807
    ref_CDsf = -0.0164800118334553
    assert abs(fnls.CL - ref_CL) < 1e-6
    assert abs(fnls.CDp - ref_CDp) < 1e-6
    assert abs(fnls.CDsf - ref_CDsf) < 1e-6


@pytest.mark.slow
def test_visc_cylinder_regression(refdir):
    """Laminar viscous cylinder, HLLC + WLS.
    Golden: testcases/visc-cylinder/regr-LeastSquares_HLLC.txt."""
    ctrl = refdir / "testcases/visc-cylinder/laminar-implicit.ctrl"
    cfg = parse_control_file(str(ctrl))
    meshfile = refdir / "testcases/visc-cylinder/grids/2dcylinderhybrid2.msh"
    if not meshfile.exists():
        # the reference generates this mesh with Gmsh at build time; it is
        # not committed, so the regression can only run where it exists
        pytest.skip("visc-cylinder mesh not committed in reference")
    mesh = load_case_mesh(cfg, str(meshfile))
    case = SteadyFlowCase(cfg)
    u, info, fnls = case.run_output(mesh)
    ref = (-0.000342434319864377, 0.325149277107277, -0.166147285368233)
    assert abs(fnls.CL - ref[0]) < 1e-6
    assert abs(fnls.CDp - ref[1]) < 1e-6
    assert abs(fnls.CDsf - ref[2]) < 1e-6


@pytest.mark.slow
def test_transonic_naca0012_weno_regression(refdir):
    """Transonic inviscid NACA0012 (M=0.8, alpha=1.25), HLLC + WENO + WLS.
    Golden: testcases/naca0012/regr-WENO_LeastSquares_HLLC.txt. Note the
    reference ran with its (uninitialized -> 0) WENO lambda; see the parity
    note in io_config/ctrl.py."""
    import dataclasses
    cfg = parse_control_file(
        str(refdir / "testcases/naca0012/transonic-sanity-test-weno.ctrl"))
    cfg = dataclasses.replace(
        cfg, main=dataclasses.replace(cfg.main, maxiter=300))
    mesh = load_case_mesh(
        cfg, str(refdir / "testcases/naca0012/grids/naca0012luo.msh"))
    u, info, fnls = SteadyFlowCase(cfg).run_output(mesh)
    assert abs(fnls.CL - 0.151870649085658) < 1e-6
    assert abs(fnls.CDp - 0.013085625502343) < 1e-6

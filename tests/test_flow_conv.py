"""Inviscid cylinder entropy grid convergence (the reference's flagship
integration test, tests/flow_conv.cpp:73-89 + tests/inv-2dcyl/): the
entropy-error order over the committed 2dcylinder mesh family must lie in
[1.65, 2.1] for the second-order scheme.

Runs the full starter+main implicit pipeline on the reference's own meshes.
"""

import math

import pytest

from fvens_tpu.config import (BCSpec, FlowCaseConfig, LinearSolverConfig,
                              NonlinearUpdateConfig, NumericsConfig,
                              PhysicsConfig, PseudoTimeConfig)
from fvens_tpu.cases import SteadyFlowCase
from fvens_tpu.cases.casesolvers import load_case_mesh


def cyl_config(flux="HLLC", gradient="LEASTSQUARES"):
    # mirrors tests/inv-2dcyl/inv-cyl-base.ctrl + inv-cyl-ls-hllc.ctrl
    return FlowCaseConfig(
        physics=PhysicsConfig(Minf=0.38, viscous=False, aoa_deg=0.0),
        numerics=NumericsConfig(flux=flux, gradient=gradient,
                                reconstruction="LINEAR", order2=True),
        bcs=[BCSpec(marker=2, type="slipwall"),
             BCSpec(marker=4, type="farfield")],
        main=PseudoTimeConfig(cfl_init=250.0, cfl_fin=5000.0, tol=1e-5,
                              maxiter=300),
        init=PseudoTimeConfig(cfl_init=25.0, cfl_fin=500.0, tol=1e-1,
                              maxiter=150),
        linear=LinearSolverConfig(restart=30, maxiter=30, rtol=1e-1,
                                  pc="bcsgs", pc_sweeps=1),
        nl_update=NonlinearUpdateConfig(scheme="robust_flow", min_factor=0.2),
        wall_markers=(2,),
    )


@pytest.mark.slow
@pytest.mark.parametrize("flux,gradient", [("HLLC", "LEASTSQUARES"),
                                           ("ROE", "GREENGAUSS")])
def test_entropy_convergence_order(refdir, flux, gradient):
    cfg = cyl_config(flux, gradient)
    case = SteadyFlowCase(cfg)
    lh, le = [], []
    for i in range(3):
        mesh = load_case_mesh(
            cfg, str(refdir / f"testcases/2dcylinder/grids/2dcylinder{i}.msh"))
        u, info, fnls = case.run_output(mesh)
        lh.append(math.log10(fnls.mesh_size))
        le.append(math.log10(fnls.entropy))
    slope = (le[-1] - le[-2]) / (lh[-1] - lh[-2])
    assert 1.65 <= slope <= 2.1, f"entropy order {slope} outside [1.65, 2.1]"

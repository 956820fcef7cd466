"""Unsteady TVD-RK + periodic boundaries: isentropic vortex advection.

Resurrects the reference's disabled isentropic-vortex accuracy test
(tests/isentropic-vortex/, commented out in tests/CMakeLists.txt:46): an
exact Euler solution advects across a fully periodic box and must return
unchanged. Checks exact mass conservation (periodic faces are conservative
by construction here) and bounded L2 error after one period.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.config import BCSpec, NumericsConfig, PhysicsConfig
from fvens_tpu.fv.residual import FlowFV
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import _grid_mesh
from fvens_tpu.physics import GasPhysics
from fvens_tpu.solver.unsteady import TVDRKSolver

GAMMA = 1.4
MINF = 0.5
EPS_V = 1.0       # vortex strength


def vortex_state(xy, x0, y0):
    """Exact isentropic vortex in FVENS non-dimensional units
    (rho_inf = |v_inf| = 1, p_inf = 1/(g M^2)): v_theta = A r e^{(1-r^2)/2},
    A = eps/(2 pi); p/rho integrates the radial momentum balance."""
    g = GAMMA
    A = EPS_V / (2 * math.pi)
    dx = xy[:, 0] - x0
    dy = xy[:, 1] - y0
    r2 = dx * dx + dy * dy
    e = np.exp(0.5 * (1.0 - r2))
    u = 1.0 - A * dy * e
    v = A * dx * e
    Tp = 1.0 / (g * MINF ** 2) - (g - 1.0) / (2 * g) * A * A * e * e
    Tp_inf = 1.0 / (g * MINF ** 2)
    rho = (Tp / Tp_inf) ** (1.0 / (g - 1.0))
    p = rho * Tp
    E = p / (g - 1.0) + 0.5 * rho * (u * u + v * v)
    return np.stack([rho, rho * u, rho * v, E], axis=1)


@pytest.mark.slow
def test_isentropic_vortex_periodic_advection():
    L = 10.0
    n = 40
    xs = np.linspace(0.0, L, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    md = _grid_mesh(X, Y, {"imin": 7, "imax": 7, "jmin": 8, "jmax": 8})

    bcs = [BCSpec(marker=7, type="periodic", periodic_axis=0),
           BCSpec(marker=8, type="periodic", periodic_axis=1)]
    cm = compile_mesh(md, bcs)

    pcfg = PhysicsConfig(Minf=MINF, viscous=False)
    ncfg = NumericsConfig(flux="ROE", gradient="LEASTSQUARES",
                          reconstruction="LINEAR", order2=True)
    phy = GasPhysics(g=GAMMA, Minf=MINF)
    space = FlowFV(phy=phy, pcfg=pcfg, ncfg=ncfg)

    rc = np.asarray(cm.rc)
    u0 = np.tile(vortex_state(np.zeros((1, 2)) + L, L / 2, L / 2), (cm.NC, 1))
    u0[: cm.n_cells] = vortex_state(rc[: cm.n_cells], L / 2, L / 2)
    u0 = jnp.asarray(u0)

    area = np.asarray(cm.area)[: cm.n_cells]
    mass0 = float((np.asarray(u0)[: cm.n_cells, 0] * area).sum())

    solver = TVDRKSolver(space, order=3, cfl=0.8)
    u, t, nsteps = solver.solve(cm, u0, final_time=L)  # one period

    un = np.asarray(u)[: cm.n_cells]
    mass1 = float((un[:, 0] * area).sum())
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0), "mass not conserved"

    # compare with the exact (initial) state; the integrator overshoots the
    # period by a partial step, so allow the advected exact solution
    xshift = (t - L)
    uex = vortex_state(rc[: cm.n_cells] - np.array([xshift, 0.0]),
                       L / 2, L / 2)
    err = np.sqrt((((un[:, 0] - uex[:, 0]) ** 2) * area).sum())
    ref = np.sqrt((((uex[:, 0] - 1.0) ** 2) * area).sum())
    assert np.isfinite(err)
    assert err < 0.5 * ref, f"vortex error too large: {err} vs {ref}"


def test_unsteady_ctrl_case(tmp_path):
    """ctrl-driven unsteady path (time { simulation_type unsteady }):
    parses the TVDRK settings, integrates to final_time EXACTLY (last step
    clipped), and produces a finite state. Reference casesolvers.cpp:420-447."""
    from fvens_tpu.cases import UnsteadyFlowCase
    from fvens_tpu.io_config import parse_control_file
    from fvens_tpu.mesh.meshgen import cylinder_omesh

    ctrl = tmp_path / "unsteady.ctrl"
    ctrl.write_text("""
io {
\tmesh_file "unused.msh"
\tsolution_output_file "u.vtu"
\tlog_file_prefix "u-log"
\tconvergence_history_required false
}
flow_conditions {
\tflow_type euler
\tadiabatic_index 1.4
\tangle_of_attack 0.0
\tfreestream_Mach_number 0.38
}
bc {
\tbc0 {
\t\ttype slipwall
\t\tmarker 2
\t}
\tbc1 {
\t\ttype farfield
\t\tmarker 4
\t}
}
time {
\tsimulation_type unsteady
\tfinal_time 0.05
\ttime_integrator TVDRK
\ttemporal_order 2
\tphysical_cfl 0.4
}
spatial_discretization {
\tinviscid_flux hllc
\tgradient_method leastsquares
\tlimiter none
}
pseudotime {
\tpseudotime_stepping_type explicit
}
""")
    cfg = parse_control_file(str(ctrl))
    assert cfg.sim_type == "unsteady"
    assert cfg.time_order == 2 and cfg.phy_cfl == 0.4
    mesh = compile_mesh(cylinder_omesh(24, 8), cfg.bcs)
    case = UnsteadyFlowCase(cfg)
    u, t, nsteps = case.solve(mesh)
    assert abs(t - 0.05) < 1e-12        # last step clipped to final_time
    assert nsteps > 1
    assert bool(jnp.isfinite(u).all())

"""Device-side functional evaluator tests (output.make_functionals).

The jitted all-device evaluator must reproduce the host-path
entropy_error + surface_data values exactly (same arithmetic, masked sums
over all boundary faces instead of a host-selected subset — adding 0.0
terms is exact), so per-step functional logging
(SteadyBackwardEuler.functional_every) cannot drift from the end-of-solve
functionals the regression tests gate on.
"""

import jax
import jax.numpy as jnp

from fvens_tpu.config import BCSpec, NumericsConfig, PhysicsConfig
from fvens_tpu.fv.residual import FlowFV
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import cylinder_omesh
from fvens_tpu.output import entropy_error, make_functionals, surface_data
from fvens_tpu.physics import GasPhysics

BCS = [BCSpec(marker=2, type="adiabaticwall", values=(0.0,)),
       BCSpec(marker=4, type="farfield")]


def _viscous_case(ni=32, nj=12):
    pcfg = PhysicsConfig(Minf=0.5, Reinf=5000.0, Tinf=288.15, viscous=True,
                         aoa_deg=2.0)
    ncfg = NumericsConfig(flux="ROE", gradient="LEASTSQUARES",
                          reconstruction="LINEAR", order2=True)
    phy = GasPhysics(g=pcfg.gamma, Minf=pcfg.Minf, Tinf=pcfg.Tinf,
                     Reinf=pcfg.Reinf, Pr=pcfg.Pr)
    space = FlowFV(phy=phy, pcfg=pcfg, ncfg=ncfg)
    cm = compile_mesh(cylinder_omesh(ni, nj), BCS, dtype=jnp.float64)
    u = jnp.tile(space.uinf, (cm.NC, 1)).astype(jnp.float64)
    key = jax.random.PRNGKey(3)
    u = u * (1.0 + 0.02 * jax.random.normal(key, u.shape, u.dtype))
    return space, cm, u


def test_device_functionals_match_host_path():
    space, cm, u = _viscous_case()
    fn = make_functionals(space, wall_markers=(2,))
    ent_d, cl_d, cdp_d, cdsf_d = (float(x) for x in fn(cm, u))

    ent_h = entropy_error(space, cm, u)
    _, (cl_h, cdp_h, cdsf_h) = surface_data(space, cm, u, (2,))

    assert abs(ent_d - ent_h) < 1e-13 * max(1.0, abs(ent_h))
    assert abs(cl_d - cl_h) < 1e-12 * max(1.0, abs(cl_h))
    assert abs(cdp_d - cdp_h) < 1e-12 * max(1.0, abs(cdp_h))
    assert abs(cdsf_d - cdsf_h) < 1e-12 * max(1.0, abs(cdsf_h))


def test_device_functionals_jit_once():
    """The evaluator is one jitted program: repeated calls on new states
    must not retrace (trace count via a side-effect counter)."""
    space, cm, u = _viscous_case()
    fn = make_functionals(space, wall_markers=(2,))
    fn(cm, u)
    n0 = fn._cache_size()
    fn(cm, u * 1.001)
    fn(cm, u * 0.999)
    assert fn._cache_size() == n0 == 1

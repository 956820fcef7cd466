"""Residual pipeline sanity: exact free-stream preservation.

A uniform free-stream field with consistent farfield ghosts must give a
machine-zero residual (closed-cell identity sum n*len = 0), for first and
second order, inviscid and viscous."""

import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.config import BCSpec, NumericsConfig, PhysicsConfig
from fvens_tpu.fv.residual import FlowFV
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import unit_square, cylinder_omesh
from fvens_tpu.physics import GasPhysics


def make_space(viscous=False, order2=True, flux="HLLC", recon="LINEAR",
               grad="LEASTSQUARES"):
    pcfg = PhysicsConfig(viscous=viscous, Minf=0.5, aoa_deg=1.0)
    ncfg = NumericsConfig(flux=flux, gradient=grad, reconstruction=recon,
                          order2=order2)
    phy = GasPhysics(g=pcfg.gamma, Minf=pcfg.Minf, Tinf=pcfg.Tinf,
                     Reinf=pcfg.Reinf, Pr=pcfg.Pr)
    return FlowFV(phy=phy, pcfg=pcfg, ncfg=ncfg)


@pytest.mark.parametrize("order2", [False, True])
@pytest.mark.parametrize("viscous", [False, True])
@pytest.mark.parametrize("recon", ["LINEAR", "WENO", "VANALBADA",
                                   "BARTHJESPERSEN", "VENKATAKRISHNAN"])
def test_freestream_preservation(order2, viscous, recon):
    md = unit_square(6, tri=True, perturb=0.2)
    cm = compile_mesh(md, [BCSpec(marker=1, type="farfield")])
    space = make_space(viscous=viscous, order2=order2, recon=recon)
    u = jnp.tile(space.uinf, (cm.NC, 1))
    rhs, dt = space.compute_residual(cm, u, True)
    r = np.asarray(rhs)[: cm.n_cells]
    assert np.abs(r).max() < 1e-12, f"freestream not preserved: {np.abs(r).max()}"
    d = np.asarray(dt)[: cm.n_cells]
    assert np.all(d > 0) and np.all(np.isfinite(d))


@pytest.mark.parametrize("flux", ["LLF", "ROE", "HLLC", "HLL", "AUSM",
                                  "AUSMPLUS", "VANLEER"])
def test_freestream_preservation_all_fluxes(flux):
    # farfield everywhere: ghost == interior == uinf, so every face flux is
    # the analytical F(uinf).n and closed cells must cancel exactly
    md = cylinder_omesh(24, 10)
    cm = compile_mesh(md, [BCSpec(marker=2, type="farfield"),
                           BCSpec(marker=4, type="farfield")])
    space = make_space(flux=flux, order2=False)
    u = jnp.tile(space.uinf, (cm.NC, 1))
    rhs, _ = space.compute_residual(cm, u, True)
    r = np.asarray(rhs)[: cm.n_cells]
    assert np.abs(r).max() < 1e-12

"""Flux and BC unit tests.

Mirrors reference tests:
  - wall-BC flux invariants: mass & energy flux through slip/adiabatic walls
    must vanish for every numerical flux (tests/flow-general/testwallbcs.cpp)
  - flux consistency f(u,u,n) = F(u).n and conservation
    f(ul,ur,n) = -f(ur,ul,-n)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.physics import GasPhysics
from fvens_tpu.fv.fluxes import FLUX_FUNCTIONS
from fvens_tpu.fv import bcs
from fvens_tpu import config as C

PHY = GasPhysics(g=1.4, Minf=0.5, Tinf=288.15, Reinf=5000.0, Pr=0.72)

# a generic interior state: subsonic, off-axis flow
U = jnp.array([1.05, 0.3, -0.2, 2.1])
N = jnp.array([np.cos(0.3), np.sin(0.3)])

ALL_FLUXES = sorted(FLUX_FUNCTIONS)


@pytest.mark.parametrize("name", ALL_FLUXES)
def test_flux_consistency(name):
    f = FLUX_FUNCTIONS[name](PHY, U, U, N)
    exact = PHY.directional_flux(U, N)
    np.testing.assert_allclose(np.asarray(f), np.asarray(exact),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("name", ALL_FLUXES)
def test_flux_conservation(name):
    ur = jnp.array([0.9, -0.1, 0.25, 2.4])
    f1 = FLUX_FUNCTIONS[name](PHY, U, ur, N)
    f2 = FLUX_FUNCTIONS[name](PHY, ur, U, -N)
    np.testing.assert_allclose(np.asarray(f1), -np.asarray(f2),
                               rtol=1e-12, atol=1e-13)


def _wall_ghost(code, v0=0.0, v1=0.0):
    ins = U[None, :]
    n = N[None, :]
    return bcs.ghost_state(PHY, ins, n, jnp.array([code]),
                           jnp.array([v0]), jnp.array([v1]),
                           PHY.freestream_state(0.0))[0]


@pytest.mark.parametrize("name", ALL_FLUXES)
@pytest.mark.parametrize("bc", [C.BC_SLIPWALL, C.BC_ADIABATIC_WALL])
def test_wall_flux_invariants(name, bc):
    """Mass and energy flux through slip and adiabatic walls must vanish to
    ~10 * machine eps (testwallbcs.cpp:30-67)."""
    ug = _wall_ghost(bc)
    f = FLUX_FUNCTIONS[name](PHY, U, ug, N)
    # 50*eps rather than the reference's 10*eps: the test normal here is
    # (cos .3, sin .3) whose FP norm is not exactly 1
    tol = 50 * 2.2e-16
    assert abs(float(f[0])) < tol, f"mass flux leak: {float(f[0])}"
    assert abs(float(f[3])) < tol, f"energy flux leak: {float(f[3])}"


def test_slipwall_ghost_reflects_normal_velocity():
    ug = _wall_ghost(C.BC_SLIPWALL)
    vn_in = float((U[1] * N[0] + U[2] * N[1]) / U[0])
    vn_g = float((ug[1] * N[0] + ug[2] * N[1]) / ug[0])
    assert abs(vn_in + vn_g) < 1e-14
    assert abs(float(ug[0] - U[0])) < 1e-15
    assert abs(float(ug[3] - U[3])) < 1e-15


def test_adiabatic_wall_ghost_negates_velocity():
    ug = _wall_ghost(C.BC_ADIABATIC_WALL, v0=0.0)
    np.testing.assert_allclose(np.asarray(ug[1:3]), -np.asarray(U[1:3]),
                               atol=1e-15)


def test_farfield_and_inflowoutflow():
    uinf = PHY.freestream_state(0.0)
    g = _wall_ghost(C.BC_FARFIELD)
    np.testing.assert_allclose(np.asarray(g), np.asarray(uinf), atol=1e-15)

    # inflow (vn < 0): ghost = farfield
    ins = jnp.array([1.0, -0.5, 0.0, 2.0])[None]
    n = jnp.array([1.0, 0.0])[None]
    g = bcs.ghost_state(PHY, ins, n, jnp.array([C.BC_INFLOWOUTFLOW]),
                        jnp.zeros(1), jnp.zeros(1), uinf)[0]
    np.testing.assert_allclose(np.asarray(g), np.asarray(uinf), atol=1e-15)

    # subsonic outflow: pressure from freestream, rest from interior
    ins = jnp.array([1.0, 0.5, 0.0, 2.0])[None]
    g = bcs.ghost_state(PHY, ins, n, jnp.array([C.BC_INFLOWOUTFLOW]),
                        jnp.zeros(1), jnp.zeros(1), uinf)[0]
    assert abs(float(PHY.pressure(g)) - PHY.p_inf) < 1e-14
    np.testing.assert_allclose(np.asarray(g[:3]), np.asarray(ins[0, :3]),
                               atol=1e-15)


@pytest.mark.parametrize("name", ALL_FLUXES)
def test_flux_jacobian_matches_finite_difference(name):
    """jacfwd of each flux (what the implicit solver assembles) vs central FD."""
    flux = FLUX_FUNCTIONS[name]
    ur = jnp.array([0.9, -0.1, 0.25, 2.4])
    JL = jax.jacfwd(lambda a: flux(PHY, a, ur, N))(U)
    JR = jax.jacfwd(lambda b: flux(PHY, U, b, N))(ur)
    assert np.all(np.isfinite(np.asarray(JL)))
    assert np.all(np.isfinite(np.asarray(JR)))
    eps = 1e-7
    for k in range(4):
        e = jnp.zeros(4).at[k].set(eps)
        fdL = (flux(PHY, U + e, ur, N) - flux(PHY, U - e, ur, N)) / (2 * eps)
        fdR = (flux(PHY, U, ur + e, N) - flux(PHY, U, ur - e, N)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(JL[:, k]), np.asarray(fdL),
                                   rtol=2e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(JR[:, k]), np.asarray(fdR),
                                   rtol=2e-6, atol=1e-7)

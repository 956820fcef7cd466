"""Inviscid numerical fluxes: LLF, Van Leer FVS, AUSM, AUSM+, Roe(-Pike),
HLL, HLLC.

Each flux is a pure function of a single (ul, ur, n) tuple of 4-vectors and a
unit normal, written branch-free (jnp.where) so it vmaps over the face batch
and differentiates with jax.jacfwd — which replaces every hand-written flux
Jacobian of the reference (FVENS src/spatial/anumericalflux.cpp, 1760 lines).

Formulas follow the reference implementations exactly:
  LLF      anumericalflux.cpp:41-61
  VanLeer  :203-253
  AUSM     :265-317
  AUSM+    :480-556
  Roe      :668-737 (Harten entropy fix, eps = 1e-4 * c_roe)
  HLL      :974-1012 (Einfeldt signal speeds, algebraic 3-term form)
  HLLC     :1176-1231 (Batten star states)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..physics.gas import GasPhysics


def _maybe_freeze(x, frozen: bool):
    """stop_gradient wrapper for wave speeds.

    The reference's hand-written implicit Jacobians linearize with FROZEN
    dissipation/signal speeds (LLF anumericalflux.cpp:66-110, HLL :1013+,
    HLLC per Batten et al.); differentiating exactly through the wave speeds
    gives a sharper but less dissipative operator that can destabilize
    transonic continuation. `frozen=True` reproduces the reference behavior
    under jax.jacfwd.
    """
    return jax.lax.stop_gradient(x) if frozen else x


def _vars(phy: GasPhysics, u, n):
    """velocity, vn, p, H, c for one state (aphysics_defs.hpp:27-38)."""
    rho = u[0]
    vx, vy = u[1] / rho, u[2] / rho
    vn = vx * n[0] + vy * n[1]
    vmag2 = vx * vx + vy * vy
    p = (phy.g - 1.0) * (u[3] - 0.5 * rho * vmag2)
    H = (u[3] + p) / rho
    c = jnp.sqrt(phy.g * p / rho)
    return vx, vy, vn, vmag2, p, H, c


def _dirflux(u, n, vn, p):
    return jnp.stack([vn * u[0],
                      vn * u[1] + p * n[0],
                      vn * u[2] + p * n[1],
                      vn * (u[3] + p)])


def _roe_averages(phy: GasPhysics, ul, ur, n):
    """(anumericalflux.hpp:175-189)."""
    vxi, vyi, vni, vm2i, pi, Hi, ci = _vars(phy, ul, n)
    vxj, vyj, vnj, vm2j, pj, Hj, cj = _vars(phy, ur, n)
    Rij = jnp.sqrt(ur[0] / ul[0])
    rhoij = Rij * ul[0]
    vxij = (Rij * vxj + vxi) / (Rij + 1.0)
    vyij = (Rij * vyj + vyi) / (Rij + 1.0)
    Hij = (Rij * Hj + Hi) / (Rij + 1.0)
    vm2ij = vxij * vxij + vyij * vyij
    vnij = vxij * n[0] + vyij * n[1]
    cij = jnp.sqrt((phy.g - 1.0) * (Hij - 0.5 * vm2ij))
    return (vxi, vyi, vni, vm2i, pi, Hi, ci,
            vxj, vyj, vnj, vm2j, pj, Hj, cj,
            rhoij, vxij, vyij, vnij, vm2ij, Hij, cij)


def llf_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    _, _, vni, _, pi, _, ci = _vars(phy, ul, n)
    _, _, vnj, _, pj, _, cj = _vars(phy, ur, n)
    eig = _maybe_freeze(jnp.maximum(jnp.abs(vni) + ci, jnp.abs(vnj) + cj),
                        frozen)
    fi = _dirflux(ul, n, vni, pi)
    fj = _dirflux(ur, n, vnj, pj)
    return 0.5 * (fi + fj - eig * (ur - ul))


def vanleer_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    g = phy.g
    vxi, vyi, vni, vm2i, pi, Hi, ci = _vars(phy, ul, n)
    vxj, vyj, vnj, vm2j, pj, Hj, cj = _vars(phy, ur, n)
    Mni, Mnj = vni / ci, vnj / cj

    # left split flux f+
    f0 = ul[0] * ci * (Mni + 1.0) ** 2 / 4.0
    fsub_i = jnp.stack([
        f0,
        f0 * (vxi + n[0] * (2.0 * ci - vni) / g),
        f0 * (vyi + n[1] * (2.0 * ci - vni) / g),
        f0 * ((vm2i - vni * vni) / 2.0
              + ((g - 1.0) * vni + 2.0 * ci) ** 2 / (2.0 * (g * g - 1.0))),
    ])
    full_i = _dirflux(ul, n, vni, pi)
    fplus = jnp.where(Mni < -1.0, 0.0, jnp.where(Mni > 1.0, full_i, fsub_i))

    # right split flux f-
    h0 = -ur[0] * cj * (Mnj - 1.0) ** 2 / 4.0
    fsub_j = jnp.stack([
        h0,
        h0 * (vxj + n[0] * (-2.0 * cj - vnj) / g),
        h0 * (vyj + n[1] * (-2.0 * cj - vnj) / g),
        h0 * ((vm2j - vnj * vnj) / 2.0
              + ((g - 1.0) * vnj - 2.0 * cj) ** 2 / (2.0 * (g * g - 1.0))),
    ])
    full_j = _dirflux(ur, n, vnj, pj)
    fminus = jnp.where(Mnj > 1.0, 0.0, jnp.where(Mnj < -1.0, full_j, fsub_j))

    return fplus + fminus


def ausm_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    _, _, vni, _, pi, _, ci = _vars(phy, ul, n)
    _, _, vnj, _, pj, _, cj = _vars(phy, ur, n)
    Mni, Mnj = vni / ci, vnj / cj

    MLs = 0.25 * (Mni + 1.0) ** 2
    ML = jnp.where(jnp.abs(Mni) <= 1.0, MLs, jnp.where(Mni < -1.0, 0.0, Mni))
    pL = jnp.where(jnp.abs(Mni) <= 1.0, MLs * pi * (2.0 - Mni),
                   jnp.where(Mni < -1.0, 0.0, pi))
    MRs = -0.25 * (Mnj - 1.0) ** 2
    MR = jnp.where(jnp.abs(Mnj) <= 1.0, MRs, jnp.where(Mnj < -1.0, Mnj, 0.0))
    pR = jnp.where(jnp.abs(Mnj) <= 1.0, -MRs * pj * (2.0 + Mnj),
                   jnp.where(Mnj < -1.0, pj, 0.0))

    Mh = ML + MR
    ph = pL + pR
    aMh = jnp.abs(Mh)
    phi_l = jnp.stack([ul[0] * ci, ul[1] * ci, ul[2] * ci, ci * (ul[3] + pi)])
    phi_r = jnp.stack([ur[0] * cj, ur[1] * cj, ur[2] * cj, cj * (ur[3] + pj)])
    pn = jnp.stack([jnp.zeros_like(ph), ph * n[0], ph * n[1], jnp.zeros_like(ph)])
    return 0.5 * Mh * (phi_l + phi_r) - 0.5 * aMh * (phi_r - phi_l) + pn


def ausmplus_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    g = phy.g
    vxi, vyi, vni, vm2i, pi, Hi, ci = _vars(phy, ul, n)
    vxj, vyj, vnj, vm2j, pj, Hj, cj = _vars(phy, ur, n)

    # interface speed of sound (anumericalflux.cpp:497-511)
    csi = jnp.sqrt((ci * ci / (g - 1.0) + 0.5 * vm2i) * 2.0 * (g - 1.0) / (g + 1.0))
    csj = jnp.sqrt((cj * cj / (g - 1.0) + 0.5 * vm2j) * 2.0 * (g - 1.0) / (g + 1.0))
    corri = jnp.maximum(csi, vni)
    corrj = jnp.maximum(csj, -vnj)
    csi = csi * csi / corri
    csj = csj * csj / corrj
    ch = jnp.minimum(csi, csj)

    Mni, Mnj = vni / ch, vnj / ch

    MLs = 0.25 * (Mni + 1.0) ** 2 + 0.125 * (Mni * Mni - 1.0) ** 2
    pLs = pi * (0.25 * (Mni + 1.0) ** 2 * (2.0 - Mni)
                + 3.0 / 16.0 * Mni * (Mni * Mni - 1.0) ** 2)
    ML = jnp.where(jnp.abs(Mni) <= 1.0, MLs, jnp.where(Mni < -1.0, 0.0, Mni))
    pL = jnp.where(jnp.abs(Mni) <= 1.0, pLs, jnp.where(Mni < -1.0, 0.0, pi))

    MRs = -0.25 * (Mnj - 1.0) ** 2 - 0.125 * (Mnj * Mnj - 1.0) ** 2
    pRs = pj * (0.25 * (Mnj - 1.0) ** 2 * (2.0 + Mnj)
                - 3.0 / 16.0 * Mnj * (Mnj * Mnj - 1.0) ** 2)
    MR = jnp.where(jnp.abs(Mnj) <= 1.0, MRs, jnp.where(Mnj < -1.0, Mnj, 0.0))
    pR = jnp.where(jnp.abs(Mnj) <= 1.0, pRs, jnp.where(Mnj < -1.0, pj, 0.0))

    Mh = ML + MR
    ph = pL + pR
    aMh = jnp.abs(Mh)
    phi_l = jnp.stack([ul[0], ul[1], ul[2], ul[3] + pi])
    phi_r = jnp.stack([ur[0], ur[1], ur[2], ur[3] + pj])
    pn = jnp.stack([jnp.zeros_like(ph), ph * n[0], ph * n[1], jnp.zeros_like(ph)])
    return ch * (0.5 * Mh * (phi_l + phi_r) - 0.5 * aMh * (phi_r - phi_l)) + pn


ROE_FIX_EPS = 1.0e-4   # Harten entropy-fix parameter (anumericalflux.cpp:664)


def roe_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    (vxi, vyi, vni, vm2i, pi, Hi, ci,
     vxj, vyj, vnj, vm2j, pj, Hj, cj,
     rhoij, vxij, vyij, vnij, vm2ij, Hij, cij) = _roe_averages(phy, ul, ur, n)

    l0 = _maybe_freeze(jnp.abs(vnij - cij), frozen)
    l1 = _maybe_freeze(jnp.abs(vnij), frozen)
    l3 = _maybe_freeze(jnp.abs(vnij + cij), frozen)

    # Harten entropy fix (anumericalflux.cpp:687-697)
    delta = ROE_FIX_EPS * cij
    fix = lambda lam: jnp.where(lam < delta,
                                (lam * lam + delta * delta) / (2.0 * delta), lam)
    l0, l1, l3 = fix(l0), fix(l1), fix(l3)

    devn = vnj - vni
    dep = pj - pi
    derho = ur[0] - ul[0]

    la0 = l0 * (dep - rhoij * cij * devn) / (2.0 * cij * cij)
    la1 = l1 * (derho - dep / (cij * cij))
    la2 = l1 * rhoij
    la3 = l3 * (dep + rhoij * cij * devn) / (2.0 * cij * cij)

    adu = jnp.stack([
        la0 + la1 + la3,
        la0 * (vxij - cij * n[0]) + la1 * vxij
        + la2 * (vxj - vxi - devn * n[0]) + la3 * (vxij + cij * n[0]),
        la0 * (vyij - cij * n[1]) + la1 * vyij
        + la2 * (vyj - vyi - devn * n[1]) + la3 * (vyij + cij * n[1]),
        la0 * (Hij - cij * vnij) + la1 * vm2ij / 2.0
        + la2 * (vxij * (vxj - vxi) + vyij * (vyj - vyi) - vnij * devn)
        + la3 * (Hij + cij * vnij),
    ])

    fi = _dirflux(ul, n, vni, pi)
    fj = _dirflux(ur, n, vnj, pj)
    return 0.5 * (fi + fj - adu)


def _einfeldt_speeds(phy, ul, ur, n):
    (vxi, vyi, vni, vm2i, pi, Hi, ci,
     vxj, vyj, vnj, vm2j, pj, Hj, cj,
     rhoij, vxij, vyij, vnij, vm2ij, Hij, cij) = _roe_averages(phy, ul, ur, n)
    sl = jnp.minimum(vni - ci, vnij - cij)
    sr = jnp.maximum(vnj + cj, vnij + cij)
    return vni, pi, Hi, vnj, pj, Hj, sl, sr


def hll_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    vni, pi, Hi, vnj, pj, Hj, sl, sr = _einfeldt_speeds(phy, ul, ur, n)
    sl = _maybe_freeze(sl, frozen)
    sr = _maybe_freeze(sr, frozen)
    sr0 = jnp.minimum(sr, 0.0)
    sl0 = jnp.minimum(sl, 0.0)
    t1 = (sr0 - sl0) / (sr - sl)
    t2 = 1.0 - t1
    t3 = 0.5 * (sr * jnp.abs(sl) - sl * jnp.abs(sr)) / (sr - sl)
    return jnp.stack([
        t1 * vnj * ur[0] + t2 * vni * ul[0] - t3 * (ur[0] - ul[0]),
        t1 * (vnj * ur[1] + pj * n[0]) + t2 * (vni * ul[1] + pi * n[0]) - t3 * (ur[1] - ul[1]),
        t1 * (vnj * ur[2] + pj * n[1]) + t2 * (vni * ul[2] + pi * n[1]) - t3 * (ur[2] - ul[2]),
        t1 * (vnj * ur[0] * Hj) + t2 * (vni * ul[0] * Hi) - t3 * (ur[3] - ul[3]),
    ])


def _hllc_star(u, n, vn, p, ss, sm):
    """Batten star state (anumericalflux.cpp:1071-1081)."""
    pstar = u[0] * (vn - ss) * (vn - sm) + p
    inv = 1.0 / (ss - sm)
    return jnp.stack([
        u[0] * (ss - vn) * inv,
        ((ss - vn) * u[1] + (pstar - p) * n[0]) * inv,
        ((ss - vn) * u[2] + (pstar - p) * n[1]) * inv,
        ((ss - vn) * u[3] - p * vn + pstar * sm) * inv,
    ])


def hllc_flux(phy: GasPhysics, ul, ur, n, frozen=False):
    vni, pi, Hi, vnj, pj, Hj, sl, sr = _einfeldt_speeds(phy, ul, ur, n)
    sl = _maybe_freeze(sl, frozen)
    sr = _maybe_freeze(sr, frozen)
    sm = ((ur[0] * vnj * (sr - vnj) - ul[0] * vni * (sl - vni) + pi - pj)
          / (ur[0] * (sr - vnj) - ul[0] * (sl - vni)))
    sm = _maybe_freeze(sm, frozen)

    fl = _dirflux(ul, n, vni, pi)
    fr = _dirflux(ur, n, vnj, pj)
    # guard the (ss - sm) divisions: only evaluated where sign-definite
    sl_safe = jnp.where(sl >= sm, sm - 1.0, sl)
    sr_safe = jnp.where(sr <= sm, sm + 1.0, sr)
    ulstr = _hllc_star(ul, n, vni, pi, sl_safe, sm)
    urstr = _hllc_star(ur, n, vnj, pj, sr_safe, sm)

    f_lstar = fl + sl * (ulstr - ul)
    f_rstar = fr + sr * (urstr - ur)

    return jnp.where(sl > 0, fl,
                     jnp.where(sm > 0, f_lstar,
                               jnp.where(sr >= 0, f_rstar, fr)))


FLUX_FUNCTIONS = {
    "LLF": llf_flux,
    "VANLEER": vanleer_flux,
    "AUSM": ausm_flux,
    "AUSMPLUS": ausmplus_flux,
    "ROE": roe_flux,
    "HLL": hll_flux,
    "HLLC": hllc_flux,
}


def get_flux(name: str):
    """Factory (reference afactory.cpp:31-98)."""
    try:
        return FLUX_FUNCTIONS[name.upper()]
    except KeyError:
        raise ValueError(f"unknown inviscid flux '{name}'") from None

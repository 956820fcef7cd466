"""Output functionals: entropy-production error, surface data and force
coefficients (CL, CDp, CDsf).

Reference: FVENS src/spatial/aoutput.cpp:28-62 (entropy) and
src/spatial/flow_spatial.cpp:130-310 (computeSurfaceData).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .fv.residual import FlowFV
from .fv.gradients import get_gradient_scheme


@dataclasses.dataclass
class FlowSolutionFunctionals:
    """(ref casesolvers.hpp FlowSolutionFunctionals)"""
    mesh_size: float = 0.0
    entropy: float = 0.0
    CL: float = 0.0
    CDp: float = 0.0
    CDsf: float = 0.0


def entropy_error(space: FlowFV, mesh, u) -> float:
    """L2 norm of relative entropy production vs free stream
    (aoutput.cpp:28-62): sqrt( sum ((s-s_inf)/s_inf)^2 * area )."""
    phy = space.phy
    uinf = space.uinf
    sinf = phy.entropy(uinf)
    s = phy.entropy(u)
    serr = (s - sinf) / sinf
    return float(jnp.sqrt((serr * serr * mesh.area * mesh.cell_mask).sum()))


def conserved_gradients(space: FlowFV, mesh, u):
    """Gradients of the CONSERVED variables with BC ghost states, as used for
    surface post-processing (flow_spatial.cpp:95-111 getGradients)."""
    ug = space.ghost_states(mesh, u)
    return get_gradient_scheme(space.ncfg.gradient)(mesh, u, ug)


def point_data(md, cell_values: np.ndarray) -> np.ndarray:
    """Area-weighted cell->node averaging for point output
    (aoutput.cpp:97-150 postprocess_point). cell_values (nelem, K) -> (npoin, K)."""
    from .mesh.topology import build_topology
    from .mesh.geometry import compute_geometry
    topo = build_topology(md)
    geom = compute_geometry(md, topo)
    npoin = md.npoin
    K = cell_values.shape[1]
    acc = np.zeros((npoin, K))
    wsum = np.zeros(npoin)
    for k in range(md.inpoel.shape[1]):
        valid = k < md.nnode
        nodes = np.where(valid, md.inpoel[:, k], 0)
        w = np.where(valid, geom.area, 0.0)
        np.add.at(acc, nodes, w[:, None] * cell_values)
        np.add.at(wsum, nodes, w)
    wsum[wsum == 0] = 1.0
    return acc / wsum[:, None]


def volume_data(space: FlowFV, mesh, u):
    """Cell-centre postprocessing table: x, y, rho, vx, vy, p, T, Mach
    (aoutput.cpp:150-299 volume dumps)."""
    phy = space.phy
    n = mesh.n_cells
    un = np.asarray(u)[:n]
    rc = np.asarray(mesh.rc)[:n]
    p = np.asarray(phy.pressure(jnp.asarray(un)))
    T = np.asarray(phy.temperature(jnp.asarray(un[:, 0]), jnp.asarray(p)))
    v = un[:, 1:3] / un[:, 0:1]
    c = np.sqrt(space.pcfg.gamma * p / un[:, 0])
    mach = np.sqrt((v ** 2).sum(1)) / c
    return np.column_stack([rc, un[:, 0], v, p, T, mach])


def _wall_cp_cf(space: FlowFV, u, grads, urec, n):
    """Pointwise wall coefficients on a batch of faces: Cp = 2 (p - p_inf);
    Cf = 2 tau_w with tau_w from the cell-centred conserved-variable
    gradients via the quotient rule (flow_spatial.cpp:225-230)."""
    phy = space.phy
    tangf = jnp.stack([n[:, 1], -n[:, 0]], axis=1)        # n x k

    p = phy.pressure(urec)
    cp = (p - phy.p_inf) * 2.0

    muhat = phy.viscosity(urec)
    rho = urec[:, 0]
    g = grads
    gradu = (g[:, :, 1:3] * rho[:, None, None]
             - urec[:, None, 1:3] * g[:, :, 0:1]) / (rho ** 2)[:, None, None]
    gradu = jnp.swapaxes(gradu, 1, 2)                     # (W, i=vel, j=dir)
    force = ((gradu + jnp.swapaxes(gradu, 1, 2)) * n[:, None, :]).sum(axis=2)
    tauw = muhat * (force * tangf).sum(axis=1)
    cf = 2.0 * tauw
    return cp, cf, tangf


def _force_coeffs(space: FlowFV, cp, cf, n, tangf, ar, wmask):
    """Integrated (CL, CDp, CDsf) as wall-masked area-weighted sums
    (flow_spatial.cpp:240-310). Device-side: masked sums over ALL boundary
    faces keep the shapes static so the whole evaluation jits."""
    aoa = space.pcfg.aoa
    wind = jnp.array([np.cos(aoa), np.sin(aoa)], dtype=cp.dtype)
    flownormal = jnp.array([-np.sin(aoa), np.cos(aoa)], dtype=cp.dtype)
    ndotw = (n * wind).sum(1)
    ndotnw = (n * flownormal).sum(1)
    tdotw = (tangf * wind).sum(1)
    w = ar * wmask
    totalarea = w.sum()
    return ((cp * ndotnw * w).sum() / totalarea,
            (cp * ndotw * w).sum() / totalarea,
            (cf * tdotw * w).sum() / totalarea)


def make_functionals(space: FlowFV, wall_markers):
    """Jitted fully-device functional evaluator: (mesh, u) ->
    (entropy, CL, CDp, CDsf) as device scalars in ONE program — no
    per-evaluation host pull of the state/gradients (the host-side
    surface_data stalls the pipeline when functionals are logged per step
    at >=200k cells). The wall mask is computed from mesh.bc_tag INSIDE
    the program so the mesh stays a jit argument, not a baked constant."""
    markers = jnp.asarray(sorted(wall_markers), jnp.int32)

    @jax.jit
    def fn(mesh, u):
        phy = space.phy
        sinf = phy.entropy(space.uinf)
        serr = (phy.entropy(u) - sinf) / sinf
        ent = jnp.sqrt((serr * serr * mesh.area * mesh.cell_mask).sum())

        grads = conserved_gradients(space, mesh, u)
        nb = mesh.bc_tag.shape[0]        # == max(n_bfaces, 1), static
        wmask = (mesh.bc_tag[:, None] == markers[None, :]).any(1)
        lelem = mesh.f_left[:nb]
        n = mesh.f_normal[:nb]
        cp, cf, tangf = _wall_cp_cf(space, u, grads[lelem], u[lelem], n)
        CL, CDp, CDsf = _force_coeffs(space, cp, cf, n, tangf,
                                      mesh.f_len[:nb],
                                      wmask.astype(u.dtype))
        return ent, CL, CDp, CDsf

    return fn


def surface_data(space: FlowFV, mesh, u, wall_markers):
    """Per-wall-face (x, y, Cp, Cf) plus integrated (CL, CDp, CDsf)
    (flow_spatial.cpp:130-310).

    Cp = 2 (p - p_inf); Cf = 2 tau_w with tau_w from the cell-centred
    conserved-variable gradients; coefficients normalized by total wall area.
    """
    grads = conserved_gradients(space, mesh, u)          # (NC,2,4)

    tags = np.asarray(mesh.bc_tag)
    wall = np.isin(tags, np.asarray(list(wall_markers)))
    sel = np.flatnonzero(wall)
    if sel.size == 0:
        return None, (0.0, 0.0, 0.0)

    lelem = mesh.f_left[sel]
    n = mesh.f_normal[sel]                                # (W,2) outward
    ar = mesh.f_len[sel]
    cp, cf, tangf = _wall_cp_cf(space, u, grads[lelem], u[lelem], n)
    Cl, Cdp, Cdsf = _force_coeffs(space, cp, cf, n, tangf, ar,
                                  jnp.ones_like(ar))
    table = np.stack([np.asarray(mesh.f_mid[sel, 0]),
                      np.asarray(mesh.f_mid[sel, 1]),
                      np.asarray(cp), np.asarray(cf)], axis=1)
    return table, (float(Cl), float(Cdp), float(Cdsf))

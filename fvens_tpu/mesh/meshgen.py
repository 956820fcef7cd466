"""Programmatic mesh generation for tests and benchmarks.

The reference builds its test grids by running Gmsh on .geo files at build
time (e.g. tests/visc-flatplate/CMakeLists.txt:71-98,
testcases/2dcylinder/grids/CMakeLists.txt). Gmsh is not available here, so
equivalent structured families are generated algebraically: unit squares
(heat-equation convergence), cylinder O-meshes (inviscid entropy convergence),
and stretched flat-plate grids (viscous CL/CD convergence).
"""

from __future__ import annotations

import numpy as np

from .reader import MeshData, _assemble


def _grid_mesh(X: np.ndarray, Y: np.ndarray, markers: dict,
               tri: bool = False, wrap_i: bool = False) -> MeshData:
    """Build a quad (or split-tri) mesh from structured node arrays X,Y of
    shape (ni+1, nj+1) [i = first index]. markers maps side name
    ('imin','imax','jmin','jmax') -> marker id. If wrap_i, i wraps around
    (O-mesh) and imin/imax sides don't exist."""
    ni = X.shape[0] - 1 if not wrap_i else X.shape[0]
    nj = X.shape[1] - 1
    npi = X.shape[0]

    def nid(i, j):
        return (i % npi if wrap_i else i) * (nj + 1) + j

    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def ccw(nodes):
        """Reorder a cell counter-clockwise if needed (positive shoelace)."""
        p = coords[nodes]
        s = 0.0
        for k in range(len(nodes)):
            q = p[(k + 1) % len(nodes)]
            s += p[k][0] * q[1] - q[0] * p[k][1]
        return nodes if s > 0 else nodes[::-1]

    cells = []
    for i in range(ni):
        for j in range(nj):
            quad = ccw([nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)])
            if tri:
                if (i + j) % 2 == 0:
                    cells.append(([quad[0], quad[1], quad[2]], []))
                    cells.append(([quad[0], quad[2], quad[3]], []))
                else:
                    cells.append(([quad[0], quad[1], quad[3]], []))
                    cells.append(([quad[1], quad[2], quad[3]], []))
            else:
                cells.append((quad, []))

    bfaces = []
    for j in range(nj):
        if not wrap_i:
            bfaces.append(([nid(0, j + 1), nid(0, j)], [markers["imin"]]))
            bfaces.append(([nid(ni, j), nid(ni, j + 1)], [markers["imax"]]))
    for i in range(ni):
        bfaces.append(([nid(i, 0), nid(i + 1, 0)], [markers["jmin"]]))
        bfaces.append(([nid(i + 1, nj), nid(i, nj)], [markers["jmax"]]))

    return _assemble(coords, cells, bfaces, nbtag=1, ndtag=0)


def unit_square(n: int, tri: bool = False, marker: int = 1,
                perturb: float = 0.0, seed: int = 7) -> MeshData:
    """n x n unit-square mesh. `perturb` jiggles interior nodes to break
    structure (for gradient-exactness tests on irregular meshes)."""
    xs = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    if perturb > 0:
        rng = np.random.default_rng(seed)
        h = 1.0 / n
        dX = rng.uniform(-1, 1, X.shape) * perturb * h
        dY = rng.uniform(-1, 1, Y.shape) * perturb * h
        dX[0, :] = dX[-1, :] = dX[:, 0] = dX[:, -1] = 0
        dY[0, :] = dY[-1, :] = dY[:, 0] = dY[:, -1] = 0
        X, Y = X + dX, Y + dY
    m = {"imin": marker, "imax": marker, "jmin": marker, "jmax": marker}
    return _grid_mesh(X, Y, m, tri=tri)


def cylinder_omesh(nt: int, nr: int, r_in: float = 1.0, r_out: float = 20.0,
                   stretch: float = 1.15, tri: bool = False,
                   wall_marker: int = 2, far_marker: int = 4) -> MeshData:
    """O-mesh around a cylinder: nt cells around, nr cells radially with
    geometric stretching (the inviscid 2dcylinder testcase family)."""
    theta = np.linspace(0.0, 2.0 * np.pi, nt + 1)[:-1]
    # geometric radial distribution
    if abs(stretch - 1.0) < 1e-12:
        t = np.linspace(0, 1, nr + 1)
    else:
        w = stretch ** np.arange(nr)
        t = np.concatenate([[0.0], np.cumsum(w)])
        t /= t[-1]
    r = r_in + (r_out - r_in) * t
    R, TH = np.meshgrid(r, theta, indexing="ij")    # (nr+1, nt)
    X = R * np.cos(TH)
    Y = R * np.sin(TH)
    # grid indexed (i=theta wraps, j=radial): transpose
    Xg = X.T  # (nt, nr+1)
    Yg = Y.T
    m = {"jmin": wall_marker, "jmax": far_marker}
    return _grid_mesh(Xg, Yg, m, tri=tri, wrap_i=True)


def cylinder_family(nmesh: int, n0t: int = 40, n0r: int = 20, tri: bool = False,
                    r_out: float = 20.0):
    """Nested refinement family for grid-convergence studies."""
    out = []
    for i in range(nmesh):
        out.append(cylinder_omesh(n0t * 2 ** i, n0r * 2 ** i, r_out=r_out,
                                  stretch=1.15 ** (1.0 / 2 ** i), tri=tri))
    return out


def _transfinite(n_points: int, prog: float, a: float, b: float) -> np.ndarray:
    """Gmsh 'Transfinite Line = n Using Progression r' distribution from a
    to b: n-1 intervals each `prog` times the previous (smallest at `a`)."""
    n = n_points - 1
    w = prog ** np.arange(n)
    t = np.concatenate([[0.0], np.cumsum(w)])
    t /= t[-1]
    return a + (b - a) * t


def _insert_midpoints(x: np.ndarray) -> np.ndarray:
    """Gmsh RefineMesh equivalent for a 1-D distribution."""
    mid = 0.5 * (x[:-1] + x[1:])
    out = np.empty(2 * x.size - 1)
    out[0::2] = x
    out[1::2] = mid
    return out


def flatplate(level: int = 0, ref: int = 2, wall_marker: int = 2,
              sym_marker: int = 3, far_marker: int = 4,
              out_marker: int = 5, tri: bool = False) -> MeshData:
    """Laminar flat-plate grid family, mirroring the reference's
    flatplatestructstretched.geo (testcases/visc-flatplate/grids/): domain
    [-0.5, 1] x [0, 1], slipwall run-up (marker 3) before the adiabatic
    plate (2) on the bottom, farfield (4) on left+top, outflow (5) right;
    transfinite progressions 1.2 (inlet x), 1.1 (plate x), 1.4 (y), globally
    midpoint-refined `level` times.
    """
    xi = _transfinite(5 * ref, 1.2, 0.0, -0.5)     # clustered at x=0
    xp = _transfinite(10 * ref, 1.1, 0.0, 1.0)     # clustered at LE
    y = _transfinite(10 * ref, 1.4, 0.0, 1.0)      # clustered at wall
    for _ in range(level):
        xi = _insert_midpoints(xi)
        xp = _insert_midpoints(xp)
        y = _insert_midpoints(y)
    x = np.concatenate([xi[::-1][:-1], xp])
    X, Y = np.meshgrid(x, y, indexing="ij")

    md = _grid_mesh(X, Y, {"imin": far_marker, "imax": out_marker,
                           "jmin": wall_marker, "jmax": far_marker},
                    tri=tri)
    # split the bottom boundary: faces ahead of the plate are slip walls
    for ib in range(md.bface.shape[0]):
        if md.bface[ib, 2] == wall_marker:
            xm = 0.5 * (md.coords[md.bface[ib, 0], 0]
                        + md.coords[md.bface[ib, 1], 0])
            if xm < 0.0:
                md.bface[ib, 2] = sym_marker
    return md


def gaussian_channel(nx: int = 40, ny: int = 16, tri: bool = True,
                     wall_marker: int = 2, in_marker: int = 3,
                     out_marker: int = 4) -> MeshData:
    """Channel with a Gaussian bump on the lower wall, mirroring the
    reference's tests/inv-gaussianbump/gaussian_channel.geo: x in [-1, 1],
    bump y = 0.02 exp(-100 x^2), flat top at y = 0.75. Markers follow
    base.ctrl: 2 = walls (top + bump), 3 = inlet, 4 = outlet."""
    x = np.linspace(-1.0, 1.0, nx + 1)
    eta = np.linspace(0.0, 1.0, ny + 1)
    ybot = 0.02 * np.exp(-100.0 * x ** 2)
    X, E = np.meshgrid(x, eta, indexing="ij")
    Y = ybot[:, None] * (1.0 - E) + 0.75 * E
    return _grid_mesh(X, Y, {"imin": in_marker, "imax": out_marker,
                             "jmin": wall_marker, "jmax": wall_marker},
                      tri=tri)


def gaussian_channel_family(nmesh: int, n0x: int = 24, n0y: int = 9,
                            tri: bool = True):
    """Refinement family for the gaussian-bump entropy-convergence test."""
    return [gaussian_channel(n0x * 2 ** i, n0y * 2 ** i, tri=tri)
            for i in range(nmesh)]


def _radial_distribution(nr: int, first_frac: float) -> np.ndarray:
    """Geometric 0..1 distribution with a prescribed first-layer fraction:
    solves f0 (r^n - 1)/(r - 1) = 1 for the ratio r by bisection."""
    if first_frac * nr >= 1.0:
        return np.linspace(0.0, 1.0, nr + 1)
    lo, hi = 1.0 + 1e-12, 4.0
    for _ in range(80):
        r = 0.5 * (lo + hi)
        total = first_frac * (r ** nr - 1.0) / (r - 1.0)
        if total < 1.0:
            lo = r
        else:
            hi = r
    w = first_frac * lo ** np.arange(nr)
    t = np.concatenate([[0.0], np.cumsum(w)])
    return t / t[-1]


def naca0012_omesh(nt: int = 160, nr: int = 48, r_out: float = 20.0,
                   first_layer: float = 2e-4, wall_marker: int = 2,
                   far_marker: int = 4) -> MeshData:
    """Algebraic O-mesh around a NACA0012 airfoil (sharp trailing edge,
    cosine clustering at LE/TE). For self-contained transonic/laminar cases."""
    # airfoil surface: cosine spacing, from TE over the top to LE and back
    beta = np.linspace(0.0, 2.0 * np.pi, nt + 1)[:-1]
    xc = 0.5 * (1.0 + np.cos(beta))          # 1 -> 0 -> 1
    t = 0.12
    yt = 5 * t * (0.2969 * np.sqrt(xc) - 0.1260 * xc - 0.3516 * xc ** 2
                  + 0.2843 * xc ** 3 - 0.1036 * xc ** 4)  # closed TE coeff
    # floor the half-thickness so the wrap cell at the sharp TE never
    # degenerates to zero area at high resolution (bench meshes only)
    yt = np.maximum(yt, 2.5e-4)
    ysurf = np.where(beta <= np.pi, yt, -yt)
    xsurf = xc
    # outer circle centred at quarter chord; outer points at UNIFORM angles
    # matched to the surface parameter (beta=0 -> +x TE direction, beta=pi
    # -> -x LE direction) so radial lines never cross at the sharp TE
    xcen, ycen = 0.25, 0.0
    Xs = np.empty((nt, nr + 1))
    Ys = np.empty((nt, nr + 1))
    tt = _radial_distribution(nr, first_layer)
    for i in range(nt):
        x0, y0 = xsurf[i], ysurf[i]
        x1 = xcen + r_out * np.cos(beta[i])
        y1 = ycen + r_out * np.sin(beta[i])
        Xs[i] = x0 + (x1 - x0) * tt
        Ys[i] = y0 + (y1 - y0) * tt
    return _grid_mesh(Xs, Ys, {"jmin": wall_marker, "jmax": far_marker},
                      tri=False, wrap_i=True)

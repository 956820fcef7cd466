"""Host-side mesh file readers: Gmsh 2.x ASCII and SU2 ASCII.

Produces a `MeshData` of raw NumPy connectivity, equivalent in content to the
reference reader output (FVENS src/mesh/meshreaders.cpp:35-391): point
coordinates, element->node connectivity (tri/quad, hybrid allowed), boundary
faces with marker tags, and per-element node/face counts.

Quadratic elements (Gmsh types 8/9/16/10) are accepted; only their corner
nodes are used for the finite-volume topology (the solver is linear-geometry,
matching the reference which computes face metrics from the first two face
nodes only, mesh.cpp:346-365).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class MeshData:
    """Raw mesh as read from a file. All indices 0-based."""

    coords: np.ndarray     # (npoin, 2) float64
    inpoel: np.ndarray     # (nelem, maxnnode) int32, -1 padded
    nnode: np.ndarray      # (nelem,) nodes per element (3 or 4 for linear)
    nfael: np.ndarray      # (nelem,) faces per element (== corner count)
    bface: np.ndarray      # (nbface, 2 + nbtag) int32: 2 face nodes + tags
    nbtag: int = 1
    ndtag: int = 0
    vol_regions: np.ndarray | None = None   # (nelem, ndtag)

    @property
    def npoin(self) -> int:
        return self.coords.shape[0]

    @property
    def nelem(self) -> int:
        return self.inpoel.shape[0]

    @property
    def nbface(self) -> int:
        return self.bface.shape[0]


# Gmsh element type -> (num nodes in file, num corner nodes or 0 for bface)
# Reference: meshreaders.cpp:113-175.
_GMSH_BFACE_TYPES = {1: 2, 8: 3}                 # linear / quadratic edge
_GMSH_CELL_TYPES = {2: (3, 3), 3: (4, 4),        # linear tri / quad
                    9: (6, 3), 16: (8, 4), 10: (9, 4)}   # quadratic


def read_gmsh2(path: str) -> MeshData:
    """Parse a Gmsh 2.0 ASCII .msh file (ref meshreaders.cpp:66-265)."""
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)

    def tok() -> str:
        return next(it)

    # $MeshFormat <ver> <filetype> <datasize> $EndMeshFormat $Nodes
    while tok() != "$Nodes":
        pass
    npoin = int(tok())
    node_block = np.array([tok() for _ in range(4 * npoin)], dtype=np.float64)
    node_block = node_block.reshape(npoin, 4)
    # Gmsh node ids may in principle be non-contiguous; the reference assumes
    # contiguous 1..npoin (meshreaders.cpp:84-90) and so do we.
    coords = node_block[:, 1:3].copy()

    while tok() != "$Elements":
        pass
    nelm = int(tok())

    bfaces = []
    cells = []
    nbtag = 0
    ndtag = 0
    for _ in range(nelm):
        _eid = tok()
        etype = int(tok())
        ntags = int(tok())
        tags = [int(tok()) for _ in range(ntags)]
        if etype in _GMSH_BFACE_TYPES:
            nn = _GMSH_BFACE_TYPES[etype]
            nodes = [int(tok()) - 1 for _ in range(nn)]
            nbtag = max(nbtag, ntags)
            bfaces.append((nodes[:2], tags))
        elif etype in _GMSH_CELL_TYPES:
            nn, ncorner = _GMSH_CELL_TYPES[etype]
            nodes = [int(tok()) - 1 for _ in range(nn)]
            ndtag = max(ndtag, ntags)
            cells.append((nodes[:ncorner], tags))
        else:
            raise ValueError(f"read_gmsh2: unsupported element type {etype}")

    return _assemble(coords, cells, bfaces, nbtag, ndtag)


def read_su2(path: str) -> MeshData:
    """Parse an SU2 ASCII mesh (ref meshreaders.cpp:267-391).

    VTK element ids: 3 = line, 5 = triangle, 9 = quad. Marker tags must be
    integers (the reference applies stoi to MARKER_TAG).
    """
    with open(path) as f:
        lines = [ln.split("%")[0].strip() for ln in f]
    lines = [ln for ln in lines if ln]

    i = 0

    def kv(key: str) -> str:
        nonlocal i
        while "=" not in lines[i] or lines[i].split("=")[0].strip() != key:
            i += 1
        val = lines[i].split("=")[1].strip()
        i += 1
        return val

    int(kv("NDIME"))
    nelem = int(kv("NELEM"))
    cells = []
    for _ in range(nelem):
        parts = lines[i].split()
        i += 1
        vid = int(parts[0])
        if vid == 5:
            cells.append(([int(p) for p in parts[1:4]], []))
        elif vid == 9:
            cells.append(([int(p) for p in parts[1:5]], []))
        else:
            raise ValueError(f"read_su2: unsupported element id {vid}")

    npoin = int(kv("NPOIN"))
    coords = np.empty((npoin, 2), dtype=np.float64)
    for ip in range(npoin):
        parts = lines[i].split()
        i += 1
        coords[ip, 0] = float(parts[0])
        coords[ip, 1] = float(parts[1])

    nmark = int(kv("NMARK"))
    bfaces = []
    for _ in range(nmark):
        tag = int(kv("MARKER_TAG"))
        nf = int(kv("MARKER_ELEMS"))
        for _ in range(nf):
            parts = lines[i].split()
            i += 1
            if int(parts[0]) != 3:
                raise ValueError("read_su2: boundary faces must be lines")
            bfaces.append(([int(parts[1]), int(parts[2])], [tag]))

    return _assemble(coords, cells, bfaces, nbtag=1, ndtag=0)


def _assemble(coords, cells, bfaces, nbtag: int, ndtag: int) -> MeshData:
    nelem = len(cells)
    nnode = np.array([len(c[0]) for c in cells], dtype=np.int32)
    maxnnode = int(nnode.max()) if nelem else 3
    inpoel = np.full((nelem, maxnnode), -1, dtype=np.int32)
    vol_regions = np.zeros((nelem, max(ndtag, 1)), dtype=np.int32)
    for ie, (nodes, tags) in enumerate(cells):
        inpoel[ie, : len(nodes)] = nodes
        for jt, t in enumerate(tags[:ndtag]):
            vol_regions[ie, jt] = t

    nbface = len(bfaces)
    bface = np.zeros((nbface, 2 + max(nbtag, 1)), dtype=np.int32)
    for ib, (nodes, tags) in enumerate(bfaces):
        bface[ib, 0:2] = nodes
        for jt, t in enumerate(tags[: max(nbtag, 1)]):
            bface[ib, 2 + jt] = t

    return MeshData(
        coords=coords,
        inpoel=inpoel,
        nnode=nnode,
        nfael=nnode.copy(),
        bface=bface,
        nbtag=max(nbtag, 1),
        ndtag=ndtag,
        vol_regions=vol_regions,
    )


def read_mesh(path: str) -> MeshData:
    """Dispatch on file extension (ref meshreaders.cpp:35-64)."""
    if path.endswith(".su2"):
        return read_su2(path)
    return read_gmsh2(path)


def compare_meshes(m1: MeshData, m2: MeshData) -> dict:
    """Field-by-field mesh equality report (reference compareMeshes,
    src/mesh/ameshutils.cpp:198-243): counts, element connectivity,
    boundary faces + tags, and coordinates to machine epsilon. Returns a
    dict of named booleans; all(report.values()) means identical."""
    rep = {
        "nelem": m1.nelem == m2.nelem,
        "npoin": m1.npoin == m2.npoin,
        "nbface": m1.bface.shape[0] == m2.bface.shape[0],
    }
    if rep["nelem"]:
        rep["nnode"] = bool(np.array_equal(m1.nnode, m2.nnode))
        rep["nfael"] = bool(np.array_equal(m1.nfael, m2.nfael))
        rep["inpoel"] = bool(np.array_equal(m1.inpoel, m2.inpoel))
    else:
        rep["nnode"] = rep["nfael"] = rep["inpoel"] = False
    rep["bface"] = (rep["nbface"]
                    and bool(np.array_equal(m1.bface, m2.bface)))
    rep["coords"] = (rep["npoin"] and bool(
        np.abs(m1.coords - m2.coords).max(initial=0.0)
        <= np.finfo(np.float64).eps))
    return rep

"""Cell reordering strategies: reverse Cuthill-McKee and line ordering.

Reference: FVENS src/mesh/meshordering.cpp + ameshutils.cpp:246-288
(-mesh_reorder {rcm, line, line_rcm}). Orderings change only the host-side
cell numbering (data locality for block solvers / future line smoothers);
the device numerics are permutation-invariant by construction.

lineReorder (meshordering.cpp:33-56): find "lines" of strongly coupled cells
via the face-weight anisotropy ratio (max/min of 1/dist between cell
centres) and number each line's cells consecutively.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .reader import MeshData
from .topology import build_topology
from .geometry import compute_geometry


def reorder_mesh(md: MeshData, perm: np.ndarray) -> MeshData:
    """Renumber cells of md by permutation `perm` (new index i holds old cell
    perm[i]), like UMesh::reorder_cells (mesh.cpp:85-100)."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return MeshData(
        coords=md.coords,
        inpoel=md.inpoel[perm],
        nnode=md.nnode[perm],
        nfael=md.nfael[perm],
        bface=md.bface,
        nbtag=md.nbtag,
        ndtag=md.ndtag,
        vol_regions=(md.vol_regions[perm]
                     if md.vol_regions is not None else None),
    )


def rcm_ordering(md: MeshData) -> np.ndarray:
    """Reverse Cuthill-McKee over the cell adjacency graph."""
    topo = build_topology(md)
    n = md.nelem
    esuel = topo.esuel
    nfael = np.asarray(topo.nfael)
    deg = (esuel >= 0).sum(axis=1)
    visited = np.zeros(n, dtype=bool)
    order = []
    while len(order) < n:
        # lowest-degree unvisited seed
        cand = np.flatnonzero(~visited)
        seed = cand[np.argmin(deg[cand])]
        q = deque([seed])
        visited[seed] = True
        while q:
            c = q.popleft()
            order.append(c)
            nbrs = [esuel[c, k] for k in range(nfael[c])
                    if 0 <= esuel[c, k] < n and not visited[esuel[c, k]]]
            for nb in sorted(nbrs, key=lambda x: deg[x]):
                visited[nb] = True
                q.append(nb)
    return np.asarray(order[::-1], dtype=np.int64)


def line_ordering(md: MeshData, anisotropy_threshold: float = 1.0
                  ) -> np.ndarray:
    """Find lines of strong coupling and number them consecutively
    (meshordering.cpp:33-56, details_lineordering.hpp:51-60).

    Face weight between two cells = 1/distance(cell centres). A cell joins a
    line if its max/min weight ratio exceeds the threshold; the line follows
    the strongest-coupling direction.
    """
    topo = build_topology(md)
    geom = compute_geometry(md, topo)
    n = md.nelem
    esuel = topo.esuel
    nfael = np.asarray(topo.nfael)
    rc = geom.rc

    def weights(c):
        out = []
        for k in range(nfael[c]):
            nb = esuel[c, k]
            if 0 <= nb < n:
                d = np.sqrt(((rc[c] - rc[nb]) ** 2).sum())
                out.append((1.0 / d, nb))
        return out

    in_line = np.full(n, -1, dtype=np.int64)
    lines = []
    for seed in range(n):
        if in_line[seed] >= 0:
            continue
        ws = weights(seed)
        if not ws:
            continue
        wmax = max(w for w, _ in ws)
        wmin = min(w for w, _ in ws)
        if wmax < anisotropy_threshold * wmin or len(ws) < 2:
            continue
        # grow a line from the seed along the strongest coupling
        line = [seed]
        in_line[seed] = len(lines)
        cur = seed
        while True:
            cand = [(w, nb) for w, nb in weights(cur) if in_line[nb] < 0]
            if not cand:
                break
            w, nb = max(cand)
            ws_nb = weights(nb)
            wmax_nb = max(x for x, _ in ws_nb)
            if w < anisotropy_threshold * min(x for x, _ in ws_nb) \
               and wmax_nb > w:
                break
            line.append(nb)
            in_line[nb] = len(lines)
            cur = nb
        if len(line) > 1:
            lines.append(line)
        else:
            in_line[seed] = -1

    order = []
    seen = np.zeros(n, dtype=bool)
    for line in lines:
        for c in line:
            if not seen[c]:
                order.append(c)
                seen[c] = True
    for c in range(n):
        if not seen[c]:
            order.append(c)
    return np.asarray(order, dtype=np.int64)


ORDERINGS = {"rcm": rcm_ordering, "line": line_ordering}


def apply_ordering(md: MeshData, name: str) -> MeshData:
    """-mesh_reorder equivalent (ameshutils.cpp:43-93)."""
    if name in (None, "", "none", "natural"):
        return md
    if name == "line_rcm":
        md = reorder_mesh(md, line_ordering(md))
        return reorder_mesh(md, rcm_ordering(md))
    return reorder_mesh(md, ORDERINGS[name](md))

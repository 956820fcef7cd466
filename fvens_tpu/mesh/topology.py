"""Host-side unstructured-mesh topology compiler (NumPy).

Computes, from raw `MeshData`, the face-based connectivity that drives every
device kernel: the interior/boundary face lists with left/right cells, the
element->face incidence with orientation signs, and element->element adjacency.

Equivalent of the reference UMesh topology (FVENS src/mesh/mesh.cpp:427-762),
with the same conventions:
  - face k of an element joins its local corner nodes k and (k+1) % nnode
    (mesh.cpp:497-499),
  - the left cell of an interior face is the lower-numbered element and the
    face's node pair is ordered so the normal (y2-y1, -(x2-x1)) points from
    left to right (mesh.cpp:712-733, 346-365),
  - physical boundary faces come first in file order, then interior faces in
    lexicographic (left element, local face) order (mesh.cpp:685-761),
  - boundary faces are re-oriented if needed so their normal points out of
    the domain (mesh.cpp:55-82).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .reader import MeshData


@dataclasses.dataclass
class Topology:
    """Face-based mesh connectivity. All faces: boundary first, interior after."""

    nelem: int
    nbface: int
    ninface: int
    # (naface, 2) left/right cell of each face; right of a boundary face is -1
    f_cells: np.ndarray
    # (naface, 2) the two nodes of each face, ordered left->right normal
    f_nodes: np.ndarray
    # (nbface, nbtag) boundary marker tags (col 0 = physical marker)
    btags: np.ndarray
    # (nelem, maxnfael) neighbour element across local face, -1 at boundary
    esuel: np.ndarray
    # (nelem, maxnfael) global face index of each local face, -1 padding
    elemface: np.ndarray
    # (nelem,) number of faces (= corner nodes) of each element
    nfael: np.ndarray
    # (nbface,) partner boundary-face index for periodic faces, else -1
    periodic_partner: np.ndarray

    @property
    def naface(self) -> int:
        return self.nbface + self.ninface


def build_topology(md: MeshData) -> Topology:
    nelem = md.nelem
    nfael = md.nfael.astype(np.int64)
    maxnf = int(nfael.max()) if nelem else 3

    # All directed element edges: (elem, local_face, node_a, node_b)
    counts = nfael
    tot = int(counts.sum())
    elem_of = np.repeat(np.arange(nelem, dtype=np.int64), counts)
    # local face index within each element (vectorized ragged arange)
    offsets = np.zeros(nelem, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:]) if nelem > 1 else None
    loc = np.arange(tot, dtype=np.int64) - np.repeat(offsets, counts)
    a = md.inpoel[elem_of, loc]
    b = md.inpoel[elem_of, (loc + 1) % counts[elem_of]]
    a = a.astype(np.int64)
    b = b.astype(np.int64)

    npoin = md.npoin
    key = np.minimum(a, b) * npoin + np.maximum(a, b)

    order = np.argsort(key, kind="stable")
    ks = key[order]
    # group boundaries
    is_first = np.ones(tot, dtype=bool)
    is_first[1:] = ks[1:] != ks[:-1]
    grp_start = np.flatnonzero(is_first)
    grp_size = np.diff(np.append(grp_start, tot))
    if np.any(grp_size > 2):
        raise ValueError("non-manifold mesh: an edge is shared by >2 elements")

    # esuel / elemface
    esuel = np.full((nelem, maxnf), -1, dtype=np.int64)
    elemface = np.full((nelem, maxnf), -1, dtype=np.int64)

    pair_idx = grp_start[grp_size == 2]
    e1, l1 = elem_of[order[pair_idx]], loc[order[pair_idx]]
    e2, l2 = elem_of[order[pair_idx + 1]], loc[order[pair_idx + 1]]
    esuel[e1, l1] = e2
    esuel[e2, l2] = e1

    # -- physical boundary faces --------------------------------------------
    nbface = md.nbface
    # host element of each boundary face, via the unmatched directed edges
    single_idx = grp_start[grp_size == 1]
    sgl_key = ks[single_idx]
    sgl_elem = elem_of[order[single_idx]]
    sgl_loc = loc[order[single_idx]]
    sort2 = np.argsort(sgl_key)
    sgl_key = sgl_key[sort2]
    sgl_elem = sgl_elem[sort2]
    sgl_loc = sgl_loc[sort2]

    bn0 = md.bface[:, 0].astype(np.int64)
    bn1 = md.bface[:, 1].astype(np.int64)
    bkey = np.minimum(bn0, bn1) * npoin + np.maximum(bn0, bn1)
    pos = np.searchsorted(sgl_key, bkey)
    if nbface and (np.any(pos >= len(sgl_key)) or np.any(sgl_key[np.minimum(pos, len(sgl_key) - 1)] != bkey)):
        raise ValueError("a boundary face does not match any element edge")
    host_elem = sgl_elem[pos] if nbface else np.empty(0, np.int64)
    host_loc = sgl_loc[pos] if nbface else np.empty(0, np.int64)

    # orient boundary faces consistently with the host element (outward normal);
    # the host's directed edge (a, b) is the outward-CCW order (mesh.cpp:55-82)
    fb_nodes = np.stack(
        [md.inpoel[host_elem, host_loc].astype(np.int64),
         md.inpoel[host_elem, (host_loc + 1) % counts[host_elem]].astype(np.int64)],
        axis=1,
    ) if nbface else np.empty((0, 2), np.int64)

    f_nodes_b = fb_nodes
    f_cells_b = np.stack([host_elem, np.full(nbface, -1, np.int64)], axis=1) \
        if nbface else np.empty((0, 2), np.int64)
    elemface[host_elem, host_loc] = np.arange(nbface)

    # -- interior faces in (left elem, local face) lexicographic order ------
    # left = smaller element index
    left_is_1 = e1 < e2
    le = np.where(left_is_1, e1, e2)
    ll = np.where(left_is_1, l1, l2)
    re = np.where(left_is_1, e2, e1)
    rl = np.where(left_is_1, l2, l1)
    iord = np.lexsort((ll, le))
    le, ll, re, rl = le[iord], ll[iord], re[iord], rl[iord]
    ninface = le.shape[0]

    f_nodes_i = np.stack(
        [md.inpoel[le, ll].astype(np.int64),
         md.inpoel[le, (ll + 1) % counts[le]].astype(np.int64)],
        axis=1,
    ) if ninface else np.empty((0, 2), np.int64)
    f_cells_i = np.stack([le, re], axis=1) if ninface else np.empty((0, 2), np.int64)
    iface_ids = nbface + np.arange(ninface)
    elemface[le, ll] = iface_ids
    elemface[re, rl] = iface_ids

    btags = md.bface[:, 2:].astype(np.int64) if nbface else np.empty((0, 1), np.int64)

    return Topology(
        nelem=nelem,
        nbface=nbface,
        ninface=ninface,
        f_cells=np.concatenate([f_cells_b, f_cells_i], axis=0),
        f_nodes=np.concatenate([f_nodes_b, f_nodes_i], axis=0),
        btags=btags,
        esuel=esuel,
        elemface=elemface,
        nfael=nfael,
        periodic_partner=np.full(nbface, -1, dtype=np.int64),
    )


def compute_periodic_map(topo: Topology, coords: np.ndarray, marker: int,
                         axis: int, tol: float = 1e-8) -> None:
    """Pair boundary faces of `marker` across a periodic direction.

    Faces are matched on the face-centre coordinate along the *other* axis
    (reference mesh.cpp:368-424). Sets topo.periodic_partner and the right
    cell of each periodic face to the partner's interior cell.
    """
    ax = 1 - axis
    bsel = np.flatnonzero(topo.btags[:, 0] == marker)
    if bsel.size == 0:
        return
    centres = 0.5 * (coords[topo.f_nodes[bsel, 0], ax] + coords[topo.f_nodes[bsel, 1], ax])
    used = np.zeros(bsel.size, dtype=bool)
    for ii in range(bsel.size):
        if used[ii]:
            continue
        for jj in range(ii + 1, bsel.size):
            if not used[jj] and abs(centres[ii] - centres[jj]) <= tol:
                fi, fj = bsel[ii], bsel[jj]
                topo.periodic_partner[fi] = fj
                topo.periodic_partner[fj] = fi
                topo.f_cells[fi, 1] = topo.f_cells[fj, 0]
                topo.f_cells[fj, 1] = topo.f_cells[fi, 0]
                used[ii] = used[jj] = True
                break

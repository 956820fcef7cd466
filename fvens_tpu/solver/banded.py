"""Banded (shifted-slice) neighbour encoding for the block linear stack.

The slot-block matvec and the block-Jacobi/SGS sweeps are bound by the
TPU's unstructured-gather rate (~1 element/ns, docs/BENCH_NOTES.md): every
Krylov iteration gathers the (NC, slots, V, V) neighbour operand through
`cell_nbrs`. On GENERATED structured meshes (the O-mesh families driving
the large-mesh benchmarks) the neighbour index is almost everywhere
`cell + d` for a handful of fixed offsets d — e.g. a ni x nj cylinder
O-mesh in row-major order has exactly SIX offsets: {-nj, -1, +1, +nj} in
the interior plus the two circumferential seam offsets +-(n_cells - nj),
covering 100% of the valid slots (measured, docs/BENCH_NOTES.md round 3).

When that holds, the per-iteration gather collapses to K contiguous
`jnp.roll` slices + batched einsums — pure HBM streaming instead of
element-at-a-time gathers. The reference meets the same need with its RCM
/ line orderings feeding banded-friendly ILU (FVENS
src/mesh/meshordering.cpp, testcases/defaults.solverc -mesh_reorder rcm);
here the TPU-native answer is to exploit the band structure directly.

Opt-in via LinearSolverConfig(banded=True): the summation order over
neighbours differs from the gather path (band order instead of slot
order), so results agree only to rounding; the default solver path stays
bit-identical. Falls back to the gather path (structure build returns
None) whenever the mesh is not band-coverable — e.g. the unstructured
hybrid NACA meshes, whose offset histogram is too flat (top-64 offsets
cover 64% after RCM; docs/BENCH_NOTES.md).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["slot_sel", "valid"],
         meta_fields=["offsets"])
@dataclasses.dataclass(frozen=True)
class BandedStructure:
    """Static band encoding of a CompiledMesh's neighbour slots.

    offsets:  K Python ints (static): band k holds neighbours at cell + d_k.
    slot_sel: (K, NC) int32 — which slot of cell_nbrs holds that neighbour
              (clamped to 0 where the band is absent; see valid).
    valid:    (K, NC) int8 — 1 where cell c really has a neighbour at
              offset d_k (selected blocks are multiplied by this).
    """
    offsets: tuple
    slot_sel: jnp.ndarray
    valid: jnp.ndarray


def banded_structure(mesh, max_bands: int = 8):
    """Host-side band analysis of mesh.cell_nbrs (NumPy, outside jit).

    Returns a BandedStructure covering EVERY valid neighbour slot with at
    most `max_bands` offsets, or None when the mesh is not band-coverable
    (the caller then keeps the gather path). Requiring 100% coverage keeps
    the banded operators exactly equivalent (up to summation order) to the
    slot-gather operators — there is no exception list to maintain.
    """
    nb = np.asarray(mesh.cell_nbrs)
    mask = np.asarray(mesh.nbr_mask) > 0          # the Jacobian's zero rule
    NC = nb.shape[0]
    off = nb - np.arange(NC, dtype=nb.dtype)[:, None]
    offs, counts = np.unique(off[mask], return_counts=True)
    if len(offs) > max_bands:
        return None
    order = np.argsort(-counts)
    offsets = tuple(int(offs[k]) for k in order)
    slot_sel = np.zeros((len(offsets), NC), dtype=np.int32)
    valid = np.zeros((len(offsets), NC), dtype=np.int8)
    for k, d in enumerate(offsets):
        hit = mask & (off == d)                   # (NC, S)
        has = hit.any(axis=1)
        slot_sel[k] = np.where(has, hit.argmax(axis=1), 0)
        valid[k] = has
    # every valid slot must land in exactly one band
    if int(valid.sum()) != int(mask.sum()):
        return None
    return BandedStructure(offsets=offsets,
                           slot_sel=jnp.asarray(slot_sel),
                           valid=jnp.asarray(valid))


def banded_blocks(bl: BandedStructure, N):
    """Reorder per-slot neighbour blocks (NC, S, V, V) into per-band blocks
    (K, NC, V, V): B[k, c] = N[c, slot_sel[k, c]] (zero where the band is
    absent). One small gather along the slot axis, paid once per Newton
    step — it replaces one gather PER KRYLOV ITERATION."""
    sel = bl.slot_sel[..., None, None, None]          # (K, NC, 1, 1, 1)
    B = jnp.take_along_axis(N[None], sel, axis=2)[:, :, 0]
    return B * bl.valid[..., None, None].astype(N.dtype)


def make_banded_matvec(D, B, offsets):
    """mv(x) = D x + sum_k B_k (x shifted by d_k): K contiguous rolls +
    batched 4x4 einsums, no index gather. Exactly equivalent to the
    slot-gather matvec up to neighbour summation order (valid-masked
    blocks are zero; rolled wrap-around values only ever multiply zeros)."""
    def mv(x):
        y = jnp.einsum("cij,cj->ci", D, x)
        for k, d in enumerate(offsets):
            y = y + jnp.einsum("cij,cj->ci", B[k], jnp.roll(x, -d, axis=0))
        return y
    return mv


def make_banded_bsgs(Dinv, DNb, offsets, sweeps: int):
    """Banded form of the pc='bsgs' damped block-Jacobi sweeps
    (solver/linear.py make_preconditioner): z' = D^-1 v - (D^-1 N) z_nbr
    with the neighbour product as shifted slices. DNb = banded_blocks of
    (D^-1 N)."""
    apply_dinv = lambda v: jnp.einsum("cij,cj->ci", Dinv, v)

    def pc(v):
        dv = apply_dinv(v)
        z = dv
        for _ in range(sweeps):
            acc = dv
            for k, d in enumerate(offsets):
                acc = acc - jnp.einsum("cij,cj->ci", DNb[k],
                                       jnp.roll(z, -d, axis=0))
            z = acc
        return z
    return pc

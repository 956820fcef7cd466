"""Pallas TPU kernels for the banded block operators (SURVEY §7.3).

The banded matvec and the bsgs sweeps are pure HBM streaming: per apply
they must read the (K, V, V, NC) band blocks exactly once (~92 MB at
204.8k cells, ~367 MB at 819.2k) plus a small state vector. The XLA
lowering of solver/banded.py pays 4-7x that (measured,
scripts/probe_gmres_scaling.py: matvec 0.75 ms at 204.8k vs the 0.11 ms
streaming model): the V=4 sublane dimension is tile-padded 4->8 on every
operand pass and the per-band multiply-reduce chain does not fuse into a
single streamed traversal.

These kernels control the layout explicitly:

  - band blocks enter as ONE 2D operand (K*V*V, NC) — NC in lanes,
    K*16 = 96/112 rows = whole (8,128) f32 tiles, zero padding waste;
  - the wrap-padded state vector sits in HBM/ANY and each grid program
    DMAs its (V, T + 2P) window into VMEM once (the shifted windows of
    all K bands are static slices of that one window, exactly the
    solver/banded.py `_shifted_windows` trick, but with no materialized
    copies at all);
  - the block tiles stream through VMEM double-buffered by the Pallas
    grid pipeline, so the apply runs at HBM speed.

One kernel body serves both operators:

  matvec:   y = sum_k B_k x_(+d_k)          (D folded in as the d=0 band)
  sweep:    z' = dv - sum_k DN_k z_(+d_k)   (base term + sign = -1)

Used automatically by the mixed-precision (f32) single-chip banded path
(solver/steady.py); the XLA path remains for f64, CPU tests, and
partitioned meshes (rest lists / shard_map). Equivalence is exact up to
summation order; tests/test_pallas.py pins it.

Reference parity: this is the TPU-native replacement for the
PETSc/BLASTed sparse kernels the reference leans on
(src/linalg/alinalg.cpp:301-384, perftest/threads_async.cpp) — the same
role the SURVEY build plan assigns to "Pallas kernels where XLA fusion
is insufficient ... the BSR ops" (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import _norm_offsets

V = 4                      # block size (NVARS)
_MAX_TILE = 8192           # lanes per grid program (see _pick_tile)
_LANE = 128                # HBM minor-dim DMA alignment quantum


def _i32_map(i):
    """Block index map. Literal index components must be int32: under
    jax_enable_x64 a bare `0` traces as i64 while program_id is i32, and
    Mosaic rejects the mixed-type index tuple (func.return legalization
    failure — found the hard way)."""
    return (jnp.int32(0), i)


def _pick_tile(NC: int, P: int):
    """Largest power-of-two tile <= _MAX_TILE that divides NC and keeps
    the (V, T + 2P) window + double-buffered block tiles inside a modest
    VMEM budget. Returns None when NC has no usable tile (caller keeps
    the XLA path)."""
    t = _MAX_TILE
    while t >= 512:
        if NC % t == 0:
            return t
        t //= 2
    return None


def _ppad(P: int) -> int:
    """DMA slices of an HBM operand must be lane-aligned in the minor dim
    (offset AND size multiples of 128), so the wrap pad is rounded up;
    the band shifts then land at unaligned offsets only inside VMEM,
    where static slices lower to cheap lane shifts."""
    return -(-P // _LANE) * _LANE


def _apply_kernel(bands_ref, xpad_ref, base_ref, out_ref, xw_ref, sem,
                  *, K, T, PP, dms, sign, has_base):
    """One grid program: out tile = [base] + sign * sum_k B_k x_window_k."""
    i = pl.program_id(0)
    # the state window for this tile: all K shifted reads live inside
    # xpad[:, i*T : i*T + T + 2*PP] (offsets normalized to |d| <= PP)
    dma = pltpu.make_async_copy(
        xpad_ref.at[:, pl.ds(i * T, T + 2 * PP)], xw_ref, sem)
    dma.start()
    dma.wait()

    blocks = bands_ref[:, :].reshape(K, V, V, T)
    xw = xw_ref[:, :]
    xs = jnp.stack([xw[:, PP + d:PP + d + T] for d in dms])   # (K, V, T)
    acc = (blocks * xs[:, None, :, :]).sum(axis=(0, 2))       # (V, T)
    if has_base:
        out_ref[:, :] = base_ref[:, :] + sign * acc
    else:
        out_ref[:, :] = sign * acc


def _banded_apply(bands2d, xpad, base, *, K, NC, T, PP, dms, sign,
                  interpret=False):
    has_base = base is not None
    kern = functools.partial(_apply_kernel, K=K, T=T, PP=PP, dms=dms,
                             sign=sign, has_base=has_base)
    in_specs = [
        pl.BlockSpec((K * V * V, T), _i32_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [bands2d, xpad]
    if has_base:
        in_specs.append(pl.BlockSpec((V, T), _i32_map,
                                     memory_space=pltpu.VMEM))
        args.append(base)
    else:
        # keep the signature uniform with a (1,1) SMEM dummy; its index
        # map needs the same explicit-int32 treatment as _i32_map (the
        # default map's literal zeros trace as i64 under x64)
        in_specs.append(pl.BlockSpec(
            (1, 1), lambda i: (jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), bands2d.dtype))

    return pl.pallas_call(
        kern,
        grid=(NC // T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((V, T), _i32_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, NC), bands2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((V, T + 2 * PP), bands2d.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*args)


def _wrap_pad(xt, PP):
    """(V, NC) -> (V, NC + 2*PP) with modular wrap, so window k of tile i
    is xpad[:, i*T + (PP + d_k) : ... + T] == roll(x, -d_k) restricted to
    the tile (solver/banded.py _shifted_windows semantics). PP is the
    lane-aligned pad (_ppad); wrapped values beyond the true max offset
    only ever multiply zero-masked blocks."""
    if PP == 0:
        return xt
    NC = xt.shape[1]
    return jnp.concatenate([xt[:, NC - PP:], xt, xt[:, :PP]], axis=1)


def pallas_supported(bl, NC, dtype) -> bool:
    """The Pallas path covers the single-chip, fully-band-covered f32 case
    (the mixed-precision Krylov). f64 stays on the XLA path (Mosaic has no
    emulated-f64 story), as do partitioned meshes (rest lists)."""
    if dtype != jnp.float32:
        return False
    if bl.rest_cell.ndim != 1 or bl.rest_cell.shape[0] != 0:
        return False
    dms = _norm_offsets(bl.offsets, NC)
    PP = _ppad(max((abs(d) for d in dms), default=0))
    T = _pick_tile(NC, PP)
    # every window [i*T, i*T + T + 2*PP) fits inside the padded vector by
    # construction; the only structural requirement is that the wrap pad
    # itself fits (PP <= NC, for the concat slices)
    return T is not None and PP <= NC


def make_banded_matvec_pallas(D, Bt, offsets, interpret=False):
    """Pallas form of solver/banded.py make_banded_matvec: the diagonal D
    joins as the d=0 band, so the whole matvec is one streamed kernel.
    D (NC, V, V); Bt (K, V, V, NC) from banded_blocks."""
    NC = D.shape[0]
    dms = (0,) + _norm_offsets(offsets, NC)
    PP = _ppad(max(abs(d) for d in dms))
    T = _pick_tile(NC, PP)
    K = len(dms)
    Dt = jnp.moveaxis(D, 0, -1)                               # (V, V, NC)
    bands2d = jnp.concatenate([Dt[None], Bt]).reshape(K * V * V, NC)

    def mv(x):
        xpad = _wrap_pad(x.T, PP)
        y = _banded_apply(bands2d, xpad, None, K=K, NC=NC, T=T, PP=PP,
                          dms=dms, sign=1.0, interpret=interpret)
        return y.T
    return mv


def make_banded_bsgs_pallas(Dinv, DNbt, offsets, sweeps: int,
                            interpret=False):
    """Pallas form of solver/banded.py make_banded_bsgs: each damped
    block-Jacobi sweep z' = D^-1 v - (D^-1 N) z_nbr is one streamed kernel
    (base = D^-1 v, sign = -1); D^-1 v itself is the d=0-only kernel."""
    NC = Dinv.shape[0]
    dms = _norm_offsets(offsets, NC)
    PP = _ppad(max((abs(d) for d in dms), default=0))
    T = _pick_tile(NC, PP)
    K = len(dms)
    Dt = jnp.moveaxis(Dinv, 0, -1)                            # (V, V, NC)
    dinv2d = Dt.reshape(V * V, NC)
    dn2d = DNbt.reshape(K * V * V, NC)

    def pc(v):
        vt = v.T
        dvt = _banded_apply(dinv2d, vt, None, K=1, NC=NC, T=T, PP=0,
                            dms=(0,), sign=1.0, interpret=interpret)
        z = dvt
        for _ in range(sweeps):
            zpad = _wrap_pad(z, PP)
            z = _banded_apply(dn2d, zpad, dvt, K=K, NC=NC, T=T, PP=PP,
                              dms=dms, sign=-1.0, interpret=interpret)
        return z.T
    return pc


# ---------------------------------------------------------------------------
# GMRES basis row append (shared by solver/linear.py's blocked path)
# ---------------------------------------------------------------------------

_PANEL = 8                 # f32 sublane tile height == RMW panel rows


def _row_set_kernel(j_ref, w_ref, v_ref, o_ref, panel_ref, sem_in, sem_out,
                    *, T):
    """Write w into row j of the basis, touching only row j's 8-row panel.

    The basis enters aliased to the output (input_output_aliases) in ANY
    memory space; appending a Krylov vector costs one 8-row panel
    read-modify-write per column tile — not the full (mpad, n)
    re-materialization XLA's dynamic-update-slice inserts inside the
    while_loop at large n (PROBE_GMRES round 5: the basis share was 9.9
    of 15.2 ms/iter at 819.2k cells). The panel granularity is forced by
    the tiled HBM layout: DMA slices must be 8-aligned in sublanes and
    128-aligned in lanes, so a bare (1, n) row slice is rejected."""
    del v_ref                      # aliased storage: only the panel changes
    i = pl.program_id(0)
    j = j_ref[0]
    p0 = pl.multiple_of((j // _PANEL) * _PANEL, _PANEL)
    dma_in = pltpu.make_async_copy(
        o_ref.at[pl.ds(p0, _PANEL), pl.ds(i * T, T)], panel_ref, sem_in)
    dma_in.start()
    dma_in.wait()
    panel_ref[j % _PANEL, :] = w_ref[0, :]
    dma_out = pltpu.make_async_copy(
        panel_ref, o_ref.at[pl.ds(p0, _PANEL), pl.ds(i * T, T)], sem_out)
    dma_out.start()
    dma_out.wait()


def row_set(V_basis, w, j, interpret=False):
    """V_basis.at[j].set(w) without copying V_basis (aliased in place).

    V_basis (mpad, n) with mpad % 8 == 0, w (n,), j traced int32. n must
    be lane-divisible (callers guarantee); rows outside row j's 8-row
    panel keep their aliased values bit-exactly, panel-mates are
    rewritten with the values just read."""
    mpad, n = V_basis.shape
    T = _pick_tile(n, 0)
    if T is None or mpad % _PANEL:
        raise ValueError(f"row_set needs a lane tile for n={n} "
                         f"and mpad % {_PANEL} == 0 (got {mpad})")
    jj = jnp.asarray(j, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // T,),
        in_specs=[
            pl.BlockSpec((1, T), lambda i, jr: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((_PANEL, T), V_basis.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        functools.partial(_row_set_kernel, T=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, n), V_basis.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jj, w.reshape(1, n), V_basis)

"""Pallas banded-kernel equivalence tests (solver/pallas_banded.py).

The Pallas kernels must match the XLA banded operators (solver/banded.py)
to f32 rounding on real assembled Jacobians. Tests run in Pallas interpret
mode on CPU (the compiled path needs a real TPU; its numerics are the same
program, pinned here by construction — the kernels are jnp expressions on
the identical band operands, only the streaming schedule differs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fvens_tpu.solver import pallas_banded as pb
from fvens_tpu.solver.banded import (banded_blocks, banded_dn_blocks,
                                     banded_structure, make_banded_bsgs,
                                     make_banded_matvec)
from fvens_tpu.solver.linear import block_jacobi_inverse

from test_banded import _case


def _f32_ops(ni=64, nj=16):
    cm, jac = _case(ni, nj)
    bl = banded_structure(cm)
    assert bl is not None
    D = jac.D.astype(jnp.float32)
    N = jac.N.astype(jnp.float32)
    Bt = banded_blocks(bl, N)
    Dinv = block_jacobi_inverse(D)
    DNbt = banded_dn_blocks(bl, Dinv, N)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (cm.NC, 4), jnp.float32)
    return cm, bl, D, Bt, Dinv, DNbt, x


def test_pallas_supported_gate():
    cm, bl, D, *_ = _f32_ops()
    # CPU meshes ARE structurally supported (the gate checks structure +
    # dtype; the platform gate lives in the solver)
    assert pb.pallas_supported(bl, cm.NC, jnp.float32)
    assert not pb.pallas_supported(bl, cm.NC, jnp.float64)


def test_tile_and_pad_rules():
    assert pb._pick_tile(819200 * 0 + 8192, 128) == 8192
    assert pb._pick_tile(204800, 640) == 8192
    assert pb._pick_tile(1000, 0) is None          # no pow2 tile divides
    assert pb._ppad(0) == 0
    assert pb._ppad(1) == 128
    assert pb._ppad(640) == 640
    assert pb._ppad(641) == 768


def test_matvec_matches_xla_banded():
    cm, bl, D, Bt, Dinv, DNbt, x = _f32_ops()
    y_ref = make_banded_matvec(D, Bt, bl.offsets)(x)
    y_p = pb.make_banded_matvec_pallas(D, Bt, bl.offsets,
                                       interpret=True)(x)
    scale = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_ref - y_p).max()) < 1e-5 * scale


def test_bsgs_matches_xla_banded():
    cm, bl, D, Bt, Dinv, DNbt, x = _f32_ops()
    z_ref = make_banded_bsgs(Dinv, DNbt, bl.offsets, 4)(x)
    z_p = pb.make_banded_bsgs_pallas(Dinv, DNbt, bl.offsets, 4,
                                     interpret=True)(x)
    scale = float(jnp.abs(z_ref).max())
    assert float(jnp.abs(z_ref - z_p).max()) < 1e-5 * scale


def test_wrap_pad_matches_roll_semantics():
    x = jnp.arange(4 * 1024, dtype=jnp.float32).reshape(4, 1024)
    PP = 128
    xp = pb._wrap_pad(x, PP)
    assert xp.shape == (4, 1024 + 2 * PP)
    # offsets are guaranteed |d| <= P <= PP by construction
    for d in (-128, -1, 0, 1, 127, 128):
        win = xp[:, PP + d:PP + d + 1024]
        np.testing.assert_array_equal(np.asarray(win),
                                      np.asarray(jnp.roll(x, -d, axis=1)))


def test_row_set_matches_at_set():
    mpad, n = 96, 4096
    key = jax.random.PRNGKey(3)
    Vb = jax.random.normal(key, (mpad, n), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (n,), jnp.float32)
    for j in (0, 5, mpad - 1):
        out = pb.row_set(Vb, w, j, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(Vb.at[j].set(w)))
    # traced row index under jit (the solver's usage inside while_loop)
    f = jax.jit(lambda V, w, j: pb.row_set(V, w, j, interpret=True))
    out = f(Vb, w, jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(Vb.at[7].set(w)))

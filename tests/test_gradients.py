"""Gradient-scheme exactness (reference tests/finite-volume/
testgradientschemes.cpp): weighted least-squares must reconstruct a linear
field exactly on regular and irregular meshes."""

import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.config import BCSpec, BC_DIRICHLET
from fvens_tpu.fv.gradients import green_gauss_gradients, least_squares_gradients
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import unit_square


def linear_field(xy):
    # two linear components, arbitrary slopes
    return np.stack([1.0 + 2.5 * xy[:, 0] - 1.25 * xy[:, 1],
                     -0.5 + 0.75 * xy[:, 0] + 3.0 * xy[:, 1]], axis=1)


EXACT = np.array([[2.5, 0.75], [-1.25, 3.0]])  # (dim, var)


@pytest.mark.parametrize("tri,perturb", [(False, 0.0), (True, 0.0),
                                         (False, 0.3), (True, 0.3)])
def test_least_squares_exact_on_linear_field(tri, perturb):
    md = unit_square(8, tri=tri, perturb=perturb)
    cm = compile_mesh(md, [BCSpec(marker=1, type="dirichlet")])
    rc = np.asarray(cm.rc)
    w = jnp.asarray(linear_field(rc))
    # exact ghost values at mirrored ghost centres
    nb = cm.n_bfaces
    wg = jnp.asarray(linear_field(np.asarray(cm.f_rcr)[:nb]))
    grads = least_squares_gradients(cm, w, wg)
    g = np.asarray(grads)[: cm.n_cells]
    err = np.abs(g - EXACT[None]).max()
    assert err < 1e-11, f"WLS gradient not exact: {err}"


def test_green_gauss_exact_on_structured_quads():
    # GG with inverse-distance face interpolation is exact for linear fields
    # on symmetric (structured quad) meshes
    md = unit_square(8, tri=False)
    cm = compile_mesh(md, [BCSpec(marker=1, type="dirichlet")])
    rc = np.asarray(cm.rc)
    w = jnp.asarray(linear_field(rc))
    nb = cm.n_bfaces
    wg = jnp.asarray(linear_field(np.asarray(cm.f_rcr)[:nb]))
    grads = green_gauss_gradients(cm, w, wg)
    g = np.asarray(grads)[: cm.n_cells]
    err = np.abs(g - EXACT[None]).max()
    assert err < 1e-11, f"GG gradient not exact on structured mesh: {err}"

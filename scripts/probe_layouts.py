"""TPU layout probe: where do the banded/gather linear-stack milliseconds go?

Hypothesis (round 3): the per-iteration operands are (NC,4,4)/(NC,4)-shaped,
i.e. minor dims 4 — but TPU tiles are (8 sublanes, 128 lanes), so such
arrays can be padded up to 32x in HBM traffic unless XLA picks a folded
layout. If true, the same math in a PLANAR layout (NC on the lane axis:
blocks as (K,4,4,NC) slices, vectors as (4,NC)) should run near HBM
bandwidth (~0.1 ms per banded sweep at 205k cells) instead of the measured
~2.7 ms.

Times, at NC cells (f32):
  1. banded bsgs sweep, current layout   (blocks (K,NC,4,4), z (NC,4))
  2. banded bsgs sweep, planar layout    (blocks (K,4,4,NC), z (4,NC))
  3. banded bsgs sweep, planar bf16 blocks
  4. banded matvec current vs planar
  5. gather bsgs sweep (the unstructured path), current vs planar-blocks
  6. GMRES orthogonalization body at (91, NC*4)
  7. raw roll / einsum micro-ops

Run:  JAX_PLATFORMS='' python scripts/probe_layouts.py [NC]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NC = int(sys.argv[1]) if len(sys.argv) > 1 else 204800
K = 6
V = 4
SWEEPS = 6
OFFSETS = (-320, -1, 1, 320, NC - 320, -(NC - 320))[:K]

key = jax.random.PRNGKey(0)


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def report(name, ms, bytes_moved):
    gbps = bytes_moved / (ms * 1e-3) / 1e9
    print(f"{name:55s} {ms:8.3f} ms   {gbps:7.1f} GB/s effective")


# ---- operands ------------------------------------------------------------
kb, kz, kn = jax.random.split(key, 3)
B_cur = jax.random.normal(kb, (K, NC, V, V), jnp.float32)      # current
B_pla = jnp.ascontiguousarray(jnp.transpose(B_cur, (0, 2, 3, 1)))  # (K,V,V,NC)
B_bf16 = B_pla.astype(jnp.bfloat16)
z_cur = jax.random.normal(kz, (NC, V), jnp.float32)
z_pla = jnp.ascontiguousarray(z_cur.T)                          # (V,NC)
dv_cur = jax.random.normal(kz, (NC, V), jnp.float32)
dv_pla = jnp.ascontiguousarray(dv_cur.T)

# bytes per sweep: read B (K*NC*16*4) + read/write z-ish (small)
B_bytes = K * NC * V * V * 4
sweep_bytes = SWEEPS * (B_bytes + 3 * NC * V * 4)
sweep_bytes_bf16 = SWEEPS * (B_bytes // 2 + 3 * NC * V * 4)


# ---- 1. banded sweep, current layout ------------------------------------
@jax.jit
def bsgs_cur(B, dv, z0):
    z = z0
    for _ in range(SWEEPS):
        acc = dv
        for k, d in enumerate(OFFSETS):
            acc = acc - jnp.einsum("cij,cj->ci", B[k],
                                   jnp.roll(z, -d, axis=0))
        z = acc
    return z


# ---- 2. banded sweep, planar layout --------------------------------------
@jax.jit
def bsgs_planar(B, dv, z0):
    # B (K,V,V,NC); dv/z (V,NC). All elementwise on (NC,)-minor slices.
    z = z0
    for _ in range(SWEEPS):
        acc = dv
        for k, d in enumerate(OFFSETS):
            zr = jnp.roll(z, -d, axis=1)
            acc = acc - jnp.einsum("ijc,jc->ic", B[k], zr)
        z = acc
    return z


# ---- 2b. planar, explicit i/j unroll (no einsum) -------------------------
@jax.jit
def bsgs_planar_unroll(B, dv, z0):
    z = z0
    for _ in range(SWEEPS):
        acc = [dv[i] for i in range(V)]
        for k, d in enumerate(OFFSETS):
            zr = jnp.roll(z, -d, axis=1)
            for i in range(V):
                s = B[k, i, 0] * zr[0]
                for j in range(1, V):
                    s = s + B[k, i, j] * zr[j]
                acc[i] = acc[i] - s
        z = jnp.stack(acc)
    return z


# ---- 3. planar bf16 blocks -----------------------------------------------
@jax.jit
def bsgs_planar_bf16(B, dv, z0):
    z = z0
    for _ in range(SWEEPS):
        acc = dv
        for k, d in enumerate(OFFSETS):
            zr = jnp.roll(z, -d, axis=1)
            acc = acc - jnp.einsum("ijc,jc->ic",
                                   B[k].astype(jnp.float32), zr)
        z = acc
    return z


# ---- 4. matvec current vs planar -----------------------------------------
D_cur = jax.random.normal(kn, (NC, V, V), jnp.float32)
D_pla = jnp.ascontiguousarray(jnp.transpose(D_cur, (1, 2, 0)))
mv_bytes = (K + 1) * NC * V * V * 4 + 3 * NC * V * 4


@jax.jit
def mv_cur(D, B, x):
    y = jnp.einsum("cij,cj->ci", D, x)
    for k, d in enumerate(OFFSETS):
        y = y + jnp.einsum("cij,cj->ci", B[k], jnp.roll(x, -d, axis=0))
    return y


@jax.jit
def mv_planar(D, B, x):
    y = jnp.einsum("ijc,jc->ic", D, x)
    for k, d in enumerate(OFFSETS):
        y = y + jnp.einsum("ijc,jc->ic", B[k], jnp.roll(x, -d, axis=1))
    return y


# ---- 5. gather-path sweep (unstructured) ---------------------------------
nbrs = jax.random.randint(kn, (NC, 4), 0, NC)
DN_cur = B_cur[:4].transpose(1, 0, 2, 3)                        # (NC,4,V,V)
gather_bytes = SWEEPS * (4 * NC * V * V * 4 + NC * 4 * 8       # blocks+idx
                         + 3 * NC * V * 4 + NC * 4 * V * 4)    # z gather


@jax.jit
def bsgs_gather(DN, dv, z0, nb):
    z = z0
    for _ in range(SWEEPS):
        z = dv - jnp.einsum("ckij,ckj->ci", DN, z[nb])
    return z


# gather planar blocks: keep the z row-gather (unavoidable) but stream the
# blocks from a planar (4,V,V,NC) layout
DN_pla = jnp.ascontiguousarray(DN_cur.transpose(1, 2, 3, 0))    # (4,V,V,NC)


@jax.jit
def bsgs_gather_planarB(DNp, dv, z0, nb):
    z = z0
    for _ in range(SWEEPS):
        zn = z[nb]                                              # (NC,4slots,V)
        acc = dv
        for k in range(4):
            acc = acc - jnp.einsum("ijc,cj->ci", DNp[k], zn[:, k])
        z = acc
    return z


# ---- 6. GMRES orthogonalization body -------------------------------------
m = 90
n = NC * V
Vb = jax.random.normal(kb, (m + 1, n), jnp.float32)
w0 = jax.random.normal(kz, (n,), jnp.float32)
ortho_bytes = 4 * (m + 1) * n * 4


@jax.jit
def ortho(Vb, w):
    h = Vb @ w
    w = w - Vb.T @ h
    h2 = Vb @ w
    w = w - Vb.T @ h2
    return w, h + h2


def main():
    print(f"NC={NC}, K={K}, sweeps={SWEEPS}, platform="
          f"{jax.devices()[0].platform}")
    report("1. bsgs sweep x6, current (K,NC,4,4)",
           timeit(bsgs_cur, B_cur, dv_cur, z_cur), sweep_bytes)
    report("2. bsgs sweep x6, planar (K,4,4,NC) einsum",
           timeit(bsgs_planar, B_pla, dv_pla, z_pla), sweep_bytes)
    report("2b. bsgs sweep x6, planar unrolled",
           timeit(bsgs_planar_unroll, B_pla, dv_pla, z_pla), sweep_bytes)
    report("3. bsgs sweep x6, planar bf16 blocks",
           timeit(bsgs_planar_bf16, B_bf16, dv_pla, z_pla), sweep_bytes_bf16)
    report("4a. matvec, current", timeit(mv_cur, D_cur, B_cur, z_cur),
           mv_bytes)
    report("4b. matvec, planar", timeit(mv_planar, D_pla, B_pla, z_pla),
           mv_bytes)
    report("5a. gather bsgs x6, current (NC,4,V,V)",
           timeit(bsgs_gather, DN_cur, dv_cur, z_cur, nbrs), gather_bytes)
    report("5b. gather bsgs x6, planar blocks (4,V,V,NC)",
           timeit(bsgs_gather_planarB, DN_pla, dv_cur, z_cur, nbrs),
           gather_bytes)
    report("6. GMRES ortho body (2xCGS) at (91, NC*4)",
           timeit(ortho, Vb, w0), ortho_bytes)


if __name__ == "__main__":
    main()

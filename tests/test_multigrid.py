"""Geometric multigrid V-cycle preconditioner: hierarchy construction,
transfer operators, and contrast-robust iteration counts."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.ops import multigrid as mg
from romhighcontrast_tpu.ops import stencil as st


def test_hierarchy_shapes():
    space = FemSpace((4, 4), 8)
    acell = st.cell_grid(jnp.ones((2, 4, 4)), 8)
    levels = mg.build_hierarchy(acell)
    shapes = [tuple(l.s.shape[-2:]) for l in levels]
    assert shapes == [(31, 31), (15, 15), (7, 7), (3, 3)]
    for l in levels:
        np.testing.assert_allclose(np.asarray(l.wt.diag), 1.0)


def test_transfer_operators_consistent():
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.standard_normal((2, 9, 9)), jnp.float32)
    fine = mg._prolong(e, (19, 19))
    assert fine.shape == (2, 19, 19)
    # prolongation reproduces coarse values at coincident vertices
    np.testing.assert_allclose(np.asarray(fine[:, 1::2, 1::2]), np.asarray(e))
    # restriction of a prolonged constant-ish field preserves scale
    ones = jnp.ones((1, 19, 19), jnp.float32)
    r = mg._restrict(ones)
    assert r.shape == (1, 9, 9)
    np.testing.assert_allclose(np.asarray(r[:, 1:-1, 1:-1]), 1.0, rtol=1e-6)


def test_mg_pcg_contrast_robust_iterations():
    """MG-preconditioned CG on the scaled f32 system converges in far fewer
    iterations than plain CG (~200) at contrast 1e10.  (Kept experimental:
    at this problem size each V-cycle costs ~8 matvecs, so wall-clock is a
    wash vs the tuned plain-CG path — measured; see docs/DESIGN.md.)"""
    space = FemSpace((4, 4), 8)
    rng = np.random.default_rng(0)
    a = np.ones((3, 4, 4))
    a[0, 1, 1] = INFINIT_A
    a[1][rng.random((4, 4)) < 0.4] = INFINIT_A
    acell = st.cell_grid(jnp.asarray(a), 8)
    levels = mg.build_hierarchy(acell)
    w = space.weights(a)
    wt, s = st.symmetrized_weights(w)
    wt32 = st.StencilCoefficients(*(x.astype(jnp.float32) for x in wt))
    b = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (3,) + space.grid_shape
    )
    bt = (s * b).astype(jnp.float32)

    x = jnp.zeros_like(bt)
    r = bt
    z = mg.v_cycle(levels, r)
    p = z
    rz = jnp.sum(r * z, axis=(-2, -1))
    bb = jnp.sum(bt * bt, axis=(-2, -1))
    iters = 0
    for it in range(80):
        Kp = st.apply_operator(wt32, p)
        alpha = rz / jnp.sum(p * Kp, axis=(-2, -1))
        x = x + alpha[..., None, None] * p
        r = r - alpha[..., None, None] * Kp
        rel = float(jnp.max(jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)) / bb)))
        iters = it + 1
        if rel < 1e-4:
            break
        z = mg.v_cycle(levels, r)
        rz_new = jnp.sum(r * z, axis=(-2, -1))
        p = z + (rz_new / rz)[..., None, None] * p
        rz = rz_new
    assert rel < 1e-4
    assert iters < 45, iters

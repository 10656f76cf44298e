"""Reference-API compatibility layer: reference call sites keep working,
including the reference's own test (test_SolutionsManager.py) semantics."""

import numpy as np
import pytest

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu.compat import (
    INFINIT_A,
    ReducedBasisGreedy,
    ReducedBasisPCA,
    ReducedBasisRandom,
    SolutionsManagerFEM,
    galerkin,
    h1_error,
    orthonormalize_base,
)


@pytest.fixture(scope="module")
def sm():
    return SolutionsManagerFEM(blocks_geometry=(2, 2), N=10, num_cores=1,
                               method="lsq")


def test_reference_riesz_test_semantics(sm):
    """The reference's own unit test, corrected for the h10 branch which the
    reference itself raises on (src/tests/.../test_SolutionsManager.py:12-15,
    SolutionsManagers.py:79)."""
    assert np.shape(sm.generate_riesz([(0, 0)], norm="l2")) == (1, sm.vspace_dim)
    with pytest.raises(NotImplementedError):
        sm.generate_riesz([(0, 0)], norm="h10")


def test_galerkin_function_matches_solve(sm):
    a = np.array([[1.0, 100.0], [10.0, 1.0]])
    coefs = galerkin(a, sm.B_total, sm.A_preassembled, method="lsq")
    direct = np.asarray(sm.solve(a, method="cholesky"))
    np.testing.assert_allclose(coefs, direct, rtol=1e-8)


def test_galerkin_ridge_matches_direct_solve(sm):
    """The reference's regularised fallback (SolutionsManagers.py:33-37,
    sklearn Ridge alpha=1e-15 on the assembled system): at that alpha the
    Tikhonov term is far below the normal-equations roundoff, so the ridge
    solution must agree with the direct solve to ~sqrt(eps)*kappa (the
    normal equations square the condition number)."""
    a = np.array([[1.0, 50.0], [10.0, 2.0]])
    coefs = galerkin(a, sm.B_total, sm.A_preassembled, method="ridge")
    direct = np.asarray(sm.solve(a, method="cholesky"))
    np.testing.assert_allclose(coefs, direct, rtol=1e-5, atol=1e-12)
    # manager-level method="ridge" routes to the Cholesky path
    sm_r = SolutionsManagerFEM(blocks_geometry=(2, 2), N=5, method="ridge")
    sols = sm_r.generate_solutions(a2try=a[None])
    assert sols.shape == (1, sm_r.vspace_dim)


def test_generate_solutions_reference_signature(sm):
    a2try = np.ones((3, 2, 2))
    a2try[0, 0, 0] = INFINIT_A
    sols = sm.generate_solutions(a2try=a2try)
    assert sols.shape == (3, sm.vspace_dim)
    assert isinstance(sols, np.ndarray)


def test_builders_reference_names(sm):
    a = np.ones((12, 2, 2))
    a[:, 0, 0] = 1 / np.linspace(1 / INFINIT_A, 1, 12, endpoint=False)
    sols = sm.generate_solutions(a)
    h1 = sm.H10norm(sols)
    import jax.numpy as jnp

    for builder in [ReducedBasisGreedy(), ReducedBasisRandom(False),
                    ReducedBasisPCA(False)]:
        rb = builder.build(n=3, sm=sm, solutions2train=jnp.asarray(sols),
                           a2train=jnp.asarray(a), solutions2train_h1norm=jnp.asarray(h1))
        assert rb.dim == 3
        fm = sm.generate_fm_solutions(a=a, coefficients_rom=rb.basis)
        assert fm.shape == sols.shape


def test_h1_error_runs():
    v = np.random.default_rng(0).standard_normal((2, 8, 8))
    out = h1_error(v)
    assert out.shape == (2,)


def test_orthonormalize_base_reference_name():
    rb = np.random.default_rng(1).standard_normal((3, 12))
    q = np.asarray(orthonormalize_base(rb))
    np.testing.assert_allclose(q @ q.T, np.eye(3), atol=1e-10)

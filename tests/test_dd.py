"""Double-f32 primitives and the fused refinement-round kernel.

The dd state is the round-3 precision architecture: these tests pin the
error-free-transform operand construction against the f64 symmetrize and
the kernel's residual evaluation against f64 ground truth at the
near-converged scale (where it must still resolve ~1e-13 relative)."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.ops import dd
from romhighcontrast_tpu.ops import solvers
from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops import twolevel as tl
from romhighcontrast_tpu.ops.pallas_cg_2l import prepare_2l
from romhighcontrast_tpu.ops.pallas_dd_round import (
    build_dd_scaled,
    dd_dims,
    dd_round,
    gather_dd,
    prepare_dd,
)


def _problem():
    space = FemSpace((2, 2), 10)
    a = np.ones((3, 2, 2))
    a[0, 0, 0] = INFINIT_A
    a[1, 1, 0] = 1e6
    w = space.weights(jnp.asarray(a))
    b = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (3,) + space.grid_shape
    )
    return space, w, b


def test_dd_primitives_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(1e-8, 1e8, 256))
    h, l = dd.dd_from_f64(x)
    # (hi, lo) f32 carries ~48 bits vs f64's 53: roundtrip to ~2^-48
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(h, l)),
                               np.asarray(x), rtol=1e-14)
    # dd_mul against f64
    y = jnp.asarray(rng.uniform(0.5, 2.0, 256))
    yh, yl = dd.dd_from_f64(y)
    ph, pe = dd.dd_mul(h.astype(jnp.float32), l.astype(jnp.float32),
                       yh.astype(jnp.float32), yl.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(ph, pe)),
                               np.asarray(x * y), rtol=1e-13)
    # dd rsqrt reaches the dd floor
    rh, rl = dd.dd_rsqrt(*map(lambda v: v.astype(jnp.float32),
                              dd.dd_from_f64(x)))
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(rh, rl)),
                               1.0 / np.sqrt(np.asarray(x)), rtol=1e-13)


def test_build_dd_scaled_matches_f64_symmetrize():
    _, w, b = _problem()
    ops = build_dd_scaled(w, b)
    wt64, s64 = st.symmetrized_weights(w)
    for name in ("wE", "wW", "wS", "wN"):
        got = np.asarray(dd.dd_to_f64(*getattr(ops, name)))
        want = np.asarray(getattr(wt64, name))
        scale = np.max(np.abs(want))
        np.testing.assert_allclose(got, want, atol=1e-13 * scale)
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(*ops.bt)),
                               np.asarray(s64 * b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(*ops.s)),
                               np.asarray(s64), rtol=1e-13)


def test_dd_round_resolves_near_converged_residual():
    """At a 1e-13-relative residual the kernel's reported norm must agree
    with the f64 ground truth to within its ~2e-13 evaluation floor."""
    space, w, b = _problem()
    ops = build_dd_scaled(w, b)
    w32 = st.StencilCoefficients(*(v.astype(jnp.float32) for v in w))
    wt3 = st.StencilCoefficients(wE=ops.wE[0], wW=ops.wW[0], wS=ops.wS[0],
                                 wN=ops.wN[0], diag=jnp.ones_like(ops.diag))
    strides = (tl.coarse_stride(19), tl.coarse_stride(19))
    co = tl.assemble_coarse(w32, *strides)
    _, dims = prepare_2l(wt3, jnp.sqrt(w32.diag), co, strides)
    prepdd = prepare_dd(ops, dims)

    x_acc, _ = solvers.solve_pcg_mixed(w, b, tol=1e-11, inner="xla")
    _, s64 = st.symmetrized_weights(w)
    xt = x_acc / s64
    xh, xl = dd.dd_from_f64(xt)
    zero = jnp.zeros((3, 19, 19), jnp.float32)
    xh2, xl2, rt, rr = dd_round(prepdd, dims, xh, xl, zero,
                                jnp.zeros(3, jnp.float32), interpret=True)
    # state preserved exactly when d = 0
    np.testing.assert_array_equal(np.asarray(xh2), np.asarray(xh))
    r64 = b - st.apply_operator(w, x_acc)
    rr64 = np.asarray(jnp.sum(r64 * r64, axis=(-2, -1)))
    bb = np.asarray(jnp.sum(b * b, axis=(-2, -1)))
    rel_true = np.sqrt(rr64 / bb)
    rel_kern = np.sqrt(np.asarray(rr) / bb)
    assert np.all(rel_kern < np.maximum(3 * rel_true, 5e-13)), (
        rel_kern, rel_true)


def test_dd_round_update_and_masking():
    """x <- x + d exactly; converged samples get a zeroed next-round rhs."""
    space, w, b = _problem()
    ops = build_dd_scaled(w, b)
    dims = dd_dims(3, 19, 19)
    prepdd = prepare_dd(ops, dims)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((3, 19, 19)) * 1e-3, jnp.float32)
    zero = jnp.zeros((3, 19, 19), jnp.float32)
    tol2bb = jnp.asarray([np.inf, 0.0, np.inf], jnp.float32)
    xh, xl, rt, rr = dd_round(prepdd, dims, zero, zero, d, tol2bb,
                              interpret=True)
    # exact accumulate
    np.testing.assert_allclose(
        np.asarray(dd.dd_to_f64(xh, xl)), np.asarray(d, np.float64), rtol=0)
    # sample 0 and 2 read as converged (inf threshold) -> masked rhs
    assert np.all(np.asarray(rt[0]) == 0) and np.all(np.asarray(rt[2]) == 0)
    assert np.any(np.asarray(rt[1]) != 0)
    # gather_dd slices consistently
    sub = gather_dd(ops, jnp.asarray([2, 0]))
    np.testing.assert_array_equal(np.asarray(sub.diag[0]),
                                  np.asarray(ops.diag[2]))


def test_phased_dd_driver_matches_oracle_high_contrast():
    """End-to-end: the dd-state phased driver must deliver f64-accurate
    solutions across a contrast sweep (interpret mode)."""
    from oracle import FemOracle

    space = FemSpace((2, 2), 8)
    oracle = FemOracle((2, 2), 8)
    a = np.ones((4, 2, 2))
    a[0, 0, 0] = INFINIT_A
    a[1, 0, 1] = 1e8
    a[2, 1, 0] = 1e4
    w = space.weights(jnp.asarray(a))
    b = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (4,) + space.grid_shape
    )
    x, info = solvers.solve_pcg_mixed(w, b, tol=1e-11, inner="pallas_2l")
    assert float(info.relative_residual.max()) < 1e-10
    for k in range(4):
        ref = oracle.solve(a[k])
        err = np.max(np.abs(np.asarray(x[k]).ravel() - ref))
        assert err / np.max(np.abs(ref)) < 1e-9, (k, err)


@pytest.mark.parametrize("rep_restart", [True, False])
def test_dd_phase_a_kernel_matches_oracle_and_rounds(rep_restart):
    """The dd-state residual-replacement phase A (``phase_a="dd"`` — ONE
    two-level kernel carrying (hi, lo) x/r with van der Vorst-Ye reliable
    updates, ops/pallas_cg_2l._pcg_2l_dd_kernel) must deliver the same
    f64-accuracy class as the restart-round driver, with an HONEST exit
    residual (a final unconditional replacement certifies against the
    compensated true residual) — in both direction modes (``rep_restart``:
    restart p = z at replacement points — the default — vs keep-beta
    ideal-CG continuation)."""
    from oracle import FemOracle

    space = FemSpace((2, 2), 8)
    oracle = FemOracle((2, 2), 8)
    a = np.ones((5, 2, 2))
    a[0, 0, 0] = INFINIT_A
    a[1, 0, 1] = 1e8
    a[2, 1, 0] = 1e4
    a[3, 1, 1] = 37.0
    w = space.weights(jnp.asarray(a))
    b = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (5,) + space.grid_shape
    )
    x, info = solvers.solve_pcg_mixed(
        w, b, tol=1e-11, inner="pallas_2l",
        inner_opts=(("phase_a", "dd"), ("rep_restart", rep_restart)))
    assert float(info.relative_residual.max()) < 1e-10
    # unified PCGInfo contract: per-sample i32 matvec-equivalents
    assert info.iterations.shape == (5,)
    assert info.iterations.dtype == jnp.int32
    assert int(info.iterations.min()) > 0
    for k in range(5):
        ref = oracle.solve(a[k])
        err = np.max(np.abs(np.asarray(x[k]).ravel() - ref))
        assert err / np.max(np.abs(ref)) < 1e-9, (k, err)


def test_dd_phase_a_warm_start_converges():
    """phase_a="dd" with a warm start x0 (the greedy builder's path) must
    refine it to tolerance, not restart from zero — iteration counts must
    be below the cold solve's."""
    space, w, b = _problem()
    x_cold, info_cold = solvers.solve_pcg_mixed(
        w, b, tol=1e-11, inner="pallas_2l",
        inner_opts=(("phase_a", "dd"),))
    # perturb the converged solution slightly: a good warm start
    x0 = x_cold * (1.0 + 1e-6)
    x_warm, info_warm = solvers.solve_pcg_mixed(
        w, b, tol=1e-11, inner="pallas_2l", x0=x0,
        inner_opts=(("phase_a", "dd"),))
    assert float(info_warm.relative_residual.max()) < 1e-10
    assert int(info_warm.iterations.max()) < int(info_cold.iterations.max())


def test_dd_gaussian_elimination_eager():
    """The unrolled dd elimination must match the f64 Cholesky solution on
    contrast-sized reduced systems (eager: XLA:CPU's jit optimizer is
    measured to break f32 EFT chains via excess-precision evaluation — the
    TPU path, where this solver is actually routed, compiles it faithfully,
    which is covered by the bench residual gates)."""
    rng = np.random.default_rng(2)
    n = 6
    Q = rng.standard_normal((4, n, n))
    scale = 10.0 ** rng.uniform(0, 5, (4, n))
    K = jnp.asarray(np.einsum("bij,bkj->bik", Q, Q) + np.eye(n) * 1e-2)
    K = K * jnp.asarray(scale[:, :, None] * scale[:, None, :]) ** 0.5
    rhs = jnp.broadcast_to(jnp.asarray(rng.standard_normal(n)), (4, n))
    Ah, Al = dd.dd_from_f64(K)
    Uh, Ul, mults, pinvs = solvers._dd_factor(Ah, Al, n)
    yh, yl = dd.dd_from_f64(rhs)
    xh, xl = solvers._dd_factor_solve(Uh, Ul, mults, pinvs, yh, yl, n)
    x = np.asarray(dd.dd_to_f64(xh, xl))
    want = np.asarray(solvers._solve_small_spd_chol(K, rhs))
    r = np.linalg.norm(np.asarray(rhs) - np.einsum("bkl,bl->bk", np.asarray(K), x), axis=-1)
    bn = np.linalg.norm(np.asarray(rhs), axis=-1)
    assert np.all(r / bn < 1e-10), r / bn
    np.testing.assert_allclose(x, want, rtol=1e-6, atol=1e-12)


def test_build_dd_scaled_from_blocks_matches_f64():
    """The from-block-coefficients EFT pipeline (no f64 full-grid arrays)
    must match the f64-weights pipeline to ~2^-48."""
    from romhighcontrast_tpu.ops.pallas_dd_round import (
        build_dd_scaled_from_blocks,
    )

    space, w, b = _problem()
    a = np.ones((3, 2, 2))
    a[0, 0, 0] = INFINIT_A
    a[1, 1, 0] = 1e6
    ops, w32 = build_dd_scaled_from_blocks(jnp.asarray(a), space.N, b)
    wt64, s64 = st.symmetrized_weights(w)
    for name in ("wE", "wW", "wS", "wN"):
        got = np.asarray(dd.dd_to_f64(*getattr(ops, name)))
        want = np.asarray(getattr(wt64, name))
        scale = np.max(np.abs(want))
        np.testing.assert_allclose(got, want, atol=2e-13 * scale)
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(*ops.s)),
                               np.asarray(s64), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(dd.dd_to_f64(*ops.bt)),
                               np.asarray(s64 * b), rtol=1e-12)
    # w32 = f32 unscaled weights for the coarse assembly
    np.testing.assert_allclose(np.asarray(w32.diag),
                               np.asarray(w.diag).astype(np.float32), rtol=0)


def test_build_dd_packed_matches_xla_build():
    """The fused Pallas operand-build kernel must reproduce
    build_dd_scaled_from_blocks + prepare_dd exactly on the hi parts and to
    sub-2^-48 on the lo parts (the XLA build's own fusion order differs)."""
    from romhighcontrast_tpu.ops import twolevel as tl
    from romhighcontrast_tpu.ops.pallas_cg_2l import pack_fine, plan_2l
    from romhighcontrast_tpu.ops.pallas_dd_round import (
        build_dd_packed,
        build_dd_scaled_from_blocks,
        prepare_dd,
    )

    rng = np.random.default_rng(0)
    for (nrb, ncb, N) in [(2, 2, 10), (3, 2, 9)]:
        B = 5
        a = jnp.asarray(
            np.exp(rng.uniform(0, np.log(1e10), (B, nrb, ncb)))
        )
        nr, nc = nrb * N - 1, ncb * N - 1
        sr, sc = tl.coarse_stride(nr), tl.coarse_stride(nc)
        m1r = tl.hat_matrix(nr, sr).shape[0]
        m1c = tl.hat_matrix(nc, sc).shape[0]
        dims = plan_2l(B, nr, nc, m1r, m1c, packed_fine=True)
        b3 = jnp.broadcast_to(
            jnp.asarray(rng.standard_normal((nr, nc))), (B, nr, nc)
        )
        K = build_dd_packed(a, N, b3, dims, interpret=True)
        ops, w32 = build_dd_scaled_from_blocks(a, N, b3)
        prepdd = prepare_dd(ops, dims)
        for name in ("wEh", "wWh", "wSh", "wNh", "bth", "diag"):
            np.testing.assert_array_equal(
                np.asarray(getattr(K, name)),
                np.asarray(getattr(prepdd, name)), err_msg=name,
            )
        for name in ("wEl", "wWl", "wSl", "wNl", "btl"):
            got = np.asarray(getattr(K, name))
            want = np.asarray(getattr(prepdd, name))
            hi = np.abs(np.asarray(getattr(prepdd, name[:-1] + "h"))).max()
            assert np.abs(got - want).max() <= 2 ** -46 * max(hi, 1.0), name
        np.testing.assert_array_equal(
            np.asarray(K.dh), np.asarray(pack_fine(jnp.sqrt(w32.diag), dims))
        )
        m = np.asarray(pack_fine(jnp.ones((B, nr, nc)), dims))
        np.testing.assert_array_equal(
            np.asarray(K.sh) * m, np.asarray(pack_fine(ops.s[0], dims))
        )


def test_piecewise_build_matches_fused():
    """The class-grid EFT + one-hot expansion (ops/piecewise.py) must
    reproduce the fused fine-grid build kernel to the dd contract: hi
    parts to 1 ulp, lo parts to 2^-46 relative (identical formulas on
    identical inputs; the residual fuzz is XLA's fusion-order freedom on
    the compensation chains, same allowance as the kernel-vs-XLA test),
    and the padding conventions (operands 0, scale 1) must match the
    kernel's mask/safe semantics exactly."""
    from romhighcontrast_tpu.ops import twolevel as tl
    from romhighcontrast_tpu.ops.pallas_cg_2l import pack_fine, plan_2l
    from romhighcontrast_tpu.ops.pallas_dd_round import build_dd_packed
    from romhighcontrast_tpu.ops.piecewise import (
        build_dd_small,
        expand_packed_operands,
        expand_raw,
    )
    from romhighcontrast_tpu.ops import stencil as st

    rng = np.random.default_rng(3)
    for (nrb, ncb, N, B) in [(2, 2, 10, 5), (3, 2, 9, 3), (4, 4, 5, 2)]:
        a = jnp.asarray(
            np.exp(rng.uniform(0, np.log(1e10), (B, nrb, ncb)))
        )
        nr, nc = nrb * N - 1, ncb * N - 1
        sr, sc = tl.coarse_stride(nr), tl.coarse_stride(nc)
        m1r = tl.hat_matrix(nr, sr).shape[0]
        m1c = tl.hat_matrix(nc, sc).shape[0]
        dims = plan_2l(B, nr, nc, m1r, m1c, packed_fine=True)
        b3 = jnp.asarray(rng.standard_normal((B, nr, nc)))
        Kf = build_dd_packed(a, N, b3, dims, interpret=True)
        small = build_dd_small(a, N, nr, nc)
        Kp = expand_packed_operands(small, b3, N, dims)
        for name in Kp._fields:
            got = np.asarray(getattr(Kp, name))
            want = np.asarray(getattr(Kf, name))
            if name.endswith("l"):  # compensation (lo) parts
                hi = np.abs(np.asarray(getattr(Kf, name[:-1] + "h"))).max()
                assert np.abs(got - want).max() <= 2 ** -46 * max(hi, 1.0), \
                    name
            else:
                np.testing.assert_allclose(got, want, rtol=2 ** -22,
                                           atol=0, err_msg=name)
        # the padding conventions must match EXACTLY (scale 1, operands 0)
        m = np.asarray(pack_fine(jnp.ones((B, nr, nc)), dims))
        assert np.all(np.asarray(Kp.sh)[m == 0] == 1.0)
        np.testing.assert_array_equal(np.asarray(Kp.diag) * m,
                                      np.asarray(Kp.diag))
        # unscaled raw weights (coarse assembly input): match the EFT hi
        # parts of the direct fine-grid build
        w = st.stencil_weights(st.cell_grid(a, N))
        raw = expand_raw(small)
        for f in w._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(raw, f)),
                np.asarray(getattr(w, f)).astype(np.float32),
                rtol=1e-7, err_msg=f,
            )

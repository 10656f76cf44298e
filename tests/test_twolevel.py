"""Two-level coarse space: band assembly vs dense oracle, preconditioner
quality, and kernel integration (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.ops import solvers
from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops import twolevel as tl


@pytest.mark.parametrize(
    "nr,nc,sr,sc", [(19, 19, 4, 4), (23, 15, 5, 3), (31, 31, 5, 5)]
)
def test_coarse_bands_match_dense_gram(nr, nc, sr, sc):
    """The separable 9-band assembly equals the dense ``P^T K P`` Gram,
    entry by entry, after Jacobi normalization."""
    rng = np.random.default_rng(0)
    acell = jnp.asarray(np.exp(3 * rng.standard_normal((2, nr + 1, nc + 1))))
    w = st.stencil_weights(acell)
    G = np.asarray(tl.coarse_gram_dense(w, sr, sc))
    op = tl.assemble_coarse(w, sr, sc)
    m1r = tl.hat_matrix(nr, sr).shape[0]
    m1c = tl.hat_matrix(nc, sc).shape[0]
    G5 = G.reshape(2, m1r, m1c, m1r, m1c)
    sg = np.asarray(op.sg)
    bands = np.asarray(op.bands)
    for dp in (-1, 0, 1):
        for dq in (-1, 0, 1):
            for p in range(m1r):
                for q in range(m1c):
                    p2, q2 = p + dp, q + dq
                    if 0 <= p2 < m1r and 0 <= q2 < m1c:
                        want = (G5[:, p, q, p2, q2] * sg[:, p, q]
                                * sg[:, p2, q2])
                        got = bands[:, dp + 1, dq + 1, p, q]
                        np.testing.assert_allclose(got, want, rtol=2e-5,
                                                   atol=1e-6)
    # out-of-range offsets must be exactly zero (the kernel's circular rolls
    # rely on this to annihilate cross-sample leakage)
    assert np.all(bands[:, 0, :, 0, :] == 0)
    assert np.all(bands[:, 2, :, -1, :] == 0)
    assert np.all(bands[:, :, 0, :, 0] == 0)
    assert np.all(bands[:, :, 2, :, -1] == 0)
    # normalized diagonal is 1
    np.testing.assert_allclose(bands[:, 1, 1], 1.0, rtol=1e-5)


def test_coarse_deflation_cuts_iterations_at_high_contrast():
    """The warped coarse space must cut outer iteration counts vs the
    single-level kernel at contrast 1e10 (the round-2 perf lever:
    234 -> ~44 fine matvecs at the paper config)."""
    space = FemSpace((2, 2), 10)
    a = np.array(
        [[[INFINIT_A, 1.0], [1.0, INFINIT_A]], [[1e6, 1.0], [1.0, 1.0]]]
    )
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (2,) + space.grid_shape
    )
    _, info2l = solvers.solve_pcg_mixed(w, rhs, tol=1e-11, inner="pallas_2l")
    _, infov2 = solvers.solve_pcg_mixed(w, rhs, tol=1e-11, inner="pallas_v2")
    # both counts are in fine matvec-equivalents (see PCGInfo), so they are
    # directly comparable: the two-level kernel must do less matvec work
    assert int(info2l.iterations.max()) < int(infov2.iterations.max())
    assert float(info2l.relative_residual.max()) < 1e-10


def test_twolevel_iteration_counts_are_honest():
    space = FemSpace((2, 2), 8)
    a = np.array([[[1.0, INFINIT_A], [1.0, 1.0]], [[1.0, 1.0], [1.0, 1.0]]])
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (2,) + space.grid_shape
    )
    _, info = solvers.solve_pcg_mixed(w, rhs, tol=1e-11, inner="pallas_2l")
    its = np.asarray(info.iterations)
    assert its.shape == (2,)
    # matvec-equivalent counts: <= 64 outer/round * 12 rounds * 13
    # matvecs/iteration (the worst phase's unit)
    assert (its > 0).all() and (its < 64 * 12 * 13).all()


def test_twolevel_small_grid_falls_back():
    """Grids with no room for a coarse space must route to the single-level
    kernel (and still converge)."""
    space = FemSpace((2, 2), 2)  # 3x3 interior grid
    a = np.array([[[1.0, 100.0], [1.0, 1.0]]])
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (1,) + space.grid_shape
    )
    x, info = solvers.solve_pcg_mixed(w, rhs, tol=1e-11, inner="pallas_2l")
    assert float(info.relative_residual.max()) < 1e-10


def test_twolevel_non_square_geometry():
    """Anisotropic block geometry + rectangular grid through the full
    ``solve`` path (strides differ per axis)."""
    from oracle import FemOracle

    space = FemSpace((2, 3), 7)  # 13 x 20 interior grid
    oracle = FemOracle((2, 3), 7)
    a = np.array([[[1.0, INFINIT_A, 1.0], [10.0, 1.0, 1e4]]])
    ref = oracle.solve(a[0])
    sol = space.solve(jnp.asarray(a), method="pallas", tol=1e-11)
    err = np.max(np.abs(np.asarray(sol)[0] - ref)) / np.max(np.abs(ref))
    assert err < 1e-9


def test_lane_multiple_grid_no_wraparound():
    """nc exactly 128 leaves NO zero guard column, so the kernel's circular
    lane rolls would wrap real data unless the dead Dirichlet-edge weights
    are zeroed (regression: silently wrong solutions at nc % 128 == 0)."""
    space = FemSpace((1, 3), 43)  # interior grid 42 x 128
    a = np.array([[[1.0, 1e6, 3.0]], [[2.0, 1.0, 1.0]]])
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (2,) + space.grid_shape
    )
    xp, infp = solvers.solve_pcg_mixed(w, rhs, tol=1e-9, inner="pallas_2l")
    xx, _ = solvers.solve_pcg_mixed(w, rhs, tol=1e-9, inner="xla")
    assert float(infp.relative_residual.max()) < 1e-9
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xx), rtol=1e-6,
                               atol=1e-10)


def test_bf16_transfer_flag_still_converges():
    """The optional bf16 coarse-transfer path (measured perf-neutral on
    TPU, kept for bigger coarse spaces) must stay correct — the transfers
    are preconditioner-internal, so convergence is the contract."""
    space = FemSpace((2, 2), 8)
    a = np.array([[[1.0, INFINIT_A], [10.0, 1.0]]])
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (1,) + space.grid_shape
    )
    _, info = solvers.solve_pcg_mixed(
        w, rhs, tol=1e-10, inner="pallas_2l",
        inner_opts=(("xfer_bf16", True),),
    )
    assert float(info.relative_residual.max()) < 1e-10


def test_hi_xfer_transfer_flag_still_converges():
    """``hi_xfer`` (HIGHEST-precision warped-transfer matmuls; measured
    perf- and accuracy-neutral on TPU — scripts/probe_2l_floor_tpu.py,
    docs/ROADMAP.md r4 item 7) must stay a correct A/B knob."""
    space = FemSpace((2, 2), 8)
    a = np.array([[[1.0, INFINIT_A], [10.0, 1.0]]])
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (1,) + space.grid_shape
    )
    _, info = solvers.solve_pcg_mixed(
        w, rhs, tol=1e-10, inner="pallas_2l",
        inner_opts=(("hi_xfer", True),),
    )
    assert float(info.relative_residual.max()) < 1e-10


def test_adaptive_round_tolerance_respects_target():
    """solve(tol=...) must deliver ~tol residuals through the adaptive
    per-round schedule (not silently stop a decade early)."""
    space = FemSpace((2, 2), 8)
    rng = np.random.default_rng(3)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), (6, 2, 2)))
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (6,) + space.grid_shape
    )
    for tol in (1e-8, 1e-10):
        _, info = solvers.solve_pcg_mixed(w, rhs, tol=tol, inner="pallas_2l")
        assert float(info.relative_residual.max()) < 3 * tol


def test_packed_fine_matches_stacked_layout():
    """The lane-packed FINE layout (all BS samples in one (H, Lf) array at
    lane pitch ``Wf = nc + 1``; per-sample scalars as (1, BS) lane vectors;
    one shared row-restriction matmul + one block-diagonal lane matmul for
    the coarse transfers) must reproduce the stacked layout's solve: same
    preconditioner operator, so identical outer-iteration counts up to
    reduction-order rounding."""
    space = FemSpace((2, 2), 10)
    a = np.array(
        [[[INFINIT_A, 1.0], [1.0, INFINIT_A]], [[1e6, 1.0], [1.0, 1.0]],
         [[1.0, 1.0], [1.0, 1e4]]]
    )
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (3,) + space.grid_shape
    )
    outs = {}
    for packed in (False, True):
        # pin deg: the default fine degree is a measured per-(BS, layout)
        # lookup, so the two layouts would otherwise legitimately run
        # different Chebyshev degrees — this test compares LAYOUTS only
        x, info = solvers.solve_pcg_mixed(
            w, rhs, tol=1e-11, inner="pallas_2l",
            inner_opts=(("packed_fine", packed), ("deg", 3)),
        )
        assert float(info.relative_residual.max()) < 1e-10
        outs[packed] = (np.asarray(x), np.asarray(info.iterations))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-9,
                               atol=1e-12)
    assert np.all(np.abs(outs[True][1] - outs[False][1]) <= 3 * 4)


def test_fused_dots_matches_split():
    """Fusing the rz/rr segment reductions into one stacked matmul
    (``fuse_dots``, measured perf-neutral so default OFF — see
    docs/ROADMAP.md) computes the same contractions — the same
    nonzero terms per output — but a (2, L) matmul may accumulate the f32
    contraction in a different SIMD order than two (1, L) ones, so the CG
    trajectory agrees to roundoff, not bitwise: both variants must deliver
    the residual gate and the same solution to solver precision."""
    space = FemSpace((2, 2), 10)
    a = np.array(
        [[[INFINIT_A, 1.0], [1.0, INFINIT_A]], [[1e6, 1.0], [1.0, 1.0]]]
    )
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (2,) + space.grid_shape
    )
    for packed in (False, True):
        outs = {}
        for fuse in (True, False):
            x, info = solvers.solve_pcg_mixed(
                w, rhs, tol=1e-10, inner="pallas_2l",
                inner_opts=(("packed_fine", packed), ("fuse_dots", fuse)),
            )
            assert float(info.relative_residual.max()) < 1e-9
            outs[fuse] = (np.asarray(x), np.asarray(info.iterations))
        np.testing.assert_allclose(outs[True][0], outs[False][0],
                                   rtol=1e-8, atol=1e-12)
        assert np.all(np.abs(outs[True][1] - outs[False][1]) <= 3 * 4)


def test_packed_fine_non_square_and_layout_roundtrip():
    """Non-square geometry through the packed-fine path + exact pack/unpack
    round-trips at awkward shapes (guard-lane pitch, lane-multiple nc)."""
    from romhighcontrast_tpu.ops.pallas_cg_2l import (
        fine_from_samples, fine_to_samples, pack_fine, unpack_fine,
    )

    space = FemSpace((3, 2), 9)  # nr != nc
    rng = np.random.default_rng(5)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), (4, 3, 2)))
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (4,) + space.grid_shape
    )
    x_ref, _ = solvers.solve_pcg_mixed(w, rhs, tol=1e-10, inner="pallas_2l")
    x_pf, info = solvers.solve_pcg_mixed(
        w, rhs, tol=1e-10, inner="pallas_2l",
        inner_opts=(("packed_fine", True),),
    )
    assert float(info.relative_residual.max()) < 1e-9
    np.testing.assert_allclose(np.asarray(x_pf), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-12)

    for (B, nr, nc, BS) in [(3, 19, 19, 8), (5, 39, 79, 4), (2, 7, 128, 2)]:
        Wf = nc + 1
        H = -(-(nr + 1) // 8) * 8
        W = -(-BS * Wf // 128) * 128
        BP = -(-B // BS) * BS
        dims = (B, nr, nc, BS, H, W, 8, 128, BP, 0, Wf)
        x = jnp.asarray(rng.standard_normal((B, nr, nc)), jnp.float32)
        xb = pack_fine(x, dims)
        assert xb.shape == (BP // BS, H, W)
        np.testing.assert_array_equal(np.asarray(unpack_fine(xb, dims)),
                                      np.asarray(x))
        v = fine_to_samples(xb, dims)
        np.testing.assert_array_equal(
            np.asarray(fine_from_samples(v, dims)), np.asarray(xb)
        )


def test_packed_coarse_matches_standard_layout():
    """The lane-packed coarse stage (all BS samples at lane pitch
    ``Wcp = m1c + 1`` in one (Hc, L) array — the round-3 perf lever) must
    solve to the same tolerance as the standard stacked layout, with
    near-identical work (the preconditioner is algebraically the same
    operator; the transfers' different matmul splitting can move a sample
    across a tolerance edge by at most an outer iteration or two)."""
    space = FemSpace((2, 2), 10)
    a = np.array(
        [[[INFINIT_A, 1.0], [1.0, INFINIT_A]], [[1e6, 1.0], [1.0, 1.0]],
         [[1.0, 1.0], [1.0, 1e4]]]
    )
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (3,) + space.grid_shape
    )
    outs = {}
    for packed in (False, True):
        x, info = solvers.solve_pcg_mixed(
            w, rhs, tol=1e-11, inner="pallas_2l",
            inner_opts=(("packed_coarse", packed),),
        )
        assert float(info.relative_residual.max()) < 1e-10
        outs[packed] = (np.asarray(x), np.asarray(info.iterations))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-9,
                               atol=1e-12)
    assert np.all(np.abs(outs[True][1] - outs[False][1]) <= 3 * 5)


def test_build_modes_agree_end_to_end():
    """The three operand-build modes of the phased driver — "piecewise"
    (class-grid EFT + one-hot expansion), "kernel" (fused fine-grid Pallas
    build), "xla" (unblocked EFT pipeline) — must deliver the same solve:
    same operator to ~2^-46, so same solutions and iteration counts up to
    reduction rounding.  Exercised through the block-coefficient entry
    (a_blocks), which is what FemSpace.solve's fast path uses."""
    space = FemSpace((2, 2), 10)
    rng = np.random.default_rng(11)
    a = jnp.asarray(np.exp(rng.uniform(0, np.log(INFINIT_A), (5, 2, 2))))
    w = space.weights(a)
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (5,) + space.grid_shape
    )
    outs = {}
    for build in ("piecewise", "kernel", "xla"):
        x, info = solvers.solve_pcg_mixed(
            w, rhs, tol=1e-11, inner="pallas_2l",
            a_blocks=a, block_N=space.N,
            inner_opts=(("build", build), ("deg", 3)),
        )
        assert float(info.relative_residual.max()) < 1e-10, build
        outs[build] = (np.asarray(x), np.asarray(info.iterations))
    for build in ("kernel", "xla"):
        np.testing.assert_allclose(outs["piecewise"][0], outs[build][0],
                                   rtol=1e-9, atol=1e-12, err_msg=build)
        assert np.all(np.abs(outs["piecewise"][1] - outs[build][1])
                      <= 3 * 4), build


def test_coarsen_bands_match_dense_gram():
    """The level-2 Galerkin coarsening (``G2 = P2^T G P2`` with hats on the
    COARSE INDEX grid) equals the dense oracle, entry by entry, after
    normalization — the algebra that makes the third level a pure repeat of
    the second (tl.coarsen_bands docstring)."""
    rng = np.random.default_rng(7)
    nr = nc = 23
    sr = sc = 3   # level-1 stride -> m1 = 7
    s2 = 2        # level-2 stride on the coarse index grid -> m2 = 3
    acell = jnp.asarray(np.exp(3 * rng.standard_normal((2, nr + 1, nc + 1))))
    w = st.stencil_weights(acell)
    raw = tl.assemble_coarse_raw(w, sr, sc)
    m1 = tl.hat_matrix(nr, sr).shape[0]
    m2 = tl.hat_matrix(m1, s2).shape[0]
    # dense oracle: P2^T G P2 with G the dense level-1 Gram
    G = np.asarray(tl.coarse_gram_dense(w, sr, sc))
    h2 = tl.hat_matrix(m1, s2)
    P2 = np.einsum("Pp,Qq->PQpq", h2, h2).reshape(m2 * m2, m1 * m1)
    G2 = np.einsum("Kk,bkl,Ll->bKL", P2, G, P2)
    op2 = tl.normalize_bands(tl.coarsen_bands(raw, s2, s2))
    sg2 = np.asarray(op2.sg)
    bands2 = np.asarray(op2.bands)
    G2_5 = G2.reshape(2, m2, m2, m2, m2)
    for dp in (-1, 0, 1):
        for dq in (-1, 0, 1):
            for p in range(m2):
                for q in range(m2):
                    p2, q2 = p + dp, q + dq
                    if 0 <= p2 < m2 and 0 <= q2 < m2:
                        want = (G2_5[:, p, q, p2, q2] * sg2[:, p, q]
                                * sg2[:, p2, q2])
                        got = bands2[:, dp + 1, dq + 1, p, q]
                        np.testing.assert_allclose(got, want, rtol=3e-5,
                                                   atol=1e-6)
    np.testing.assert_allclose(bands2[:, 1, 1], 1.0, rtol=1e-5)
    assert np.all(bands2[:, 0, :, 0, :] == 0)
    assert np.all(bands2[:, :, 2, :, -1] == 0)


def test_three_level_solve_matches_two_level():
    """The optional THIRD level (r4: warped level-2 correction inside the
    coarse solve, packed-fine layout) must deliver the same solve as the
    two-level default — it only changes the preconditioner."""
    space = FemSpace((2, 2), 12)  # 23 x 23 interior, stride 2 -> m1 = 11
    a = np.array(
        [[[INFINIT_A, 1.0], [1.0, INFINIT_A]], [[1e6, 1.0], [1.0, 1.0]],
         [[1.0, 1.0], [1.0, 1e4]]]
    )
    w = space.weights(jnp.asarray(a))
    rhs = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), (3,) + space.grid_shape
    )
    x2, info2 = solvers.solve_pcg_mixed(w, rhs, tol=1e-11, inner="pallas_2l")
    x3, info3 = solvers.solve_pcg_mixed(
        w, rhs, tol=1e-11, inner="pallas_2l",
        inner_opts=(("stride2", 2), ("dc2", 6), ("cl2min", 0.05)),
    )
    assert float(info3.relative_residual.max()) < 1e-10
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x2), rtol=1e-8,
                               atol=1e-12)


def test_three_level_through_fused_build_and_solve_api():
    """Third level through the FemSpace.solve fast path (fused
    block-coefficient operand build), which is what the bench runs."""
    space = FemSpace((2, 2), 12)
    rng = np.random.default_rng(13)
    a = jnp.asarray(np.exp(rng.uniform(0, np.log(INFINIT_A), (4, 2, 2))))
    x2 = space.solve(a, method="pallas", tol=1e-10)
    x3, info = space.solve(
        a, method="pallas", tol=1e-10, return_info=True,
        inner_opts=(("stride2", 2), ("dc2", 6)),
    )
    assert float(info.relative_residual.max()) < 1e-9
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x2), rtol=1e-8,
                               atol=1e-12)


def test_auto_block_size_packed_lane_economics():
    """The packed block-size model picks by lane economics under the raised
    VMEM budget (pallas_cg.VMEM_BUDGET_BYTES): smallest lane-padding
    fraction, ties to the larger BS, Lf capped at 2048.  Pin the measured
    sweep optima (scripts/sweep_r4_stride.py main4/main5, TPU 2026-08-19)
    at the three suite meshes."""
    from romhighcontrast_tpu.ops.pallas_cg_2l import (
        _round_up, auto_block_size_packed)

    for n, want in ((79, 16), (159, 8), (255, 8)):
        s = tl.coarse_stride(n)
        m1 = tl.hat_matrix(n, s).shape[0]
        H = _round_up(n + 1, 8)
        bs = auto_block_size_packed(H, n, m1, m1)
        assert bs == want, (n, bs)
        Lf = _round_up(bs * (n + 1), 128)
        assert Lf <= 2048
        assert Lf == bs * (n + 1)  # zero dead lanes at the suite meshes


def test_coarse_stride_capped_at_16():
    """Strides past 16 collapse at high contrast regardless of the nominal
    spectral design (measured at n=511: stride 32 = 53 solves/s vs
    stride 16 = 248, scripts/sweep_r4h_mesh128.py, TPU 2026-08-20); every
    measured optimum lies in [5, 16].  Pin the rule at the suite meshes
    plus the scale points."""
    for n, want in ((79, 5), (159, 5), (255, 16), (511, 16), (1023, 16)):
        assert tl.coarse_stride(n) == want, (n, tl.coarse_stride(n))
    assert tl.coarse_stride(19) == 2  # floor unchanged

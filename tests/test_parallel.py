"""Multi-device sharding paths on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.parallel import (
    data_mesh,
    sharded_snapshot_solve,
    sharded_solve_pallas,
    sharded_training_step,
)
from romhighcontrast_tpu.parallel.mesh import shard_batch, batch_sharding


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return data_mesh(8)


def test_shard_batch_pads_and_places(mesh):
    x = np.arange(10 * 3, dtype=float).reshape(10, 3)
    xs, n = shard_batch(x, mesh)
    assert n == 10
    assert xs.shape[0] == 16  # padded to multiple of 8
    np.testing.assert_array_equal(np.asarray(xs)[:10], x)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh), ndim=xs.ndim)


def test_sharded_solve_matches_single_device(mesh):
    space = FemSpace((2, 2), 5)
    rng = np.random.default_rng(0)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), size=(11, 2, 2)))
    got = np.asarray(sharded_snapshot_solve(space, a, mesh))
    want = np.asarray(space.solve(a))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-14)


def test_sharded_pallas_solve_matches_single_device(mesh):
    """The FLAGSHIP fused-Pallas phased driver, sharded over the mesh via
    jax.shard_map (VERDICT r4 #1): parity vs the same kernel single-device
    at 1e-9, residuals gated at the asked tolerance."""
    space = FemSpace((2, 2), 5)
    rng = np.random.default_rng(0)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), size=(11, 2, 2)))
    got, info = sharded_solve_pallas(space, a, mesh, tol=1e-11,
                                     return_info=True)
    want = np.asarray(space.solve(a, method="pallas", tol=1e-11))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-12)
    assert got.shape == (11, space.vspace_dim)
    assert info.iterations.shape == (11,)
    assert float(np.max(np.asarray(info.relative_residual))) < 1e-10


def test_sharded_pallas_routes_via_snapshot_solve(mesh):
    """sharded_snapshot_solve dispatches pallas-family methods through
    shard_map (SPMD cannot partition a pallas_call)."""
    space = FemSpace((2, 2), 5, method="pallas")
    rng = np.random.default_rng(1)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), size=(9, 2, 2)))
    got = np.asarray(sharded_snapshot_solve(space, a, mesh))
    want = np.asarray(space.solve(a, method="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_sharded_pallas_cluster_routing(mesh):
    """Interior-stiff-cluster samples are detected over the GLOBAL batch and
    routed off the sharded fast path (host real-f64 direct solve, or the f64
    deflated device solver) — same policy as FemSpace.solve single-device."""
    from romhighcontrast_tpu.ops import stencil as st

    space = FemSpace((3, 3), 5)
    a = np.ones((10, 3, 3))
    a[0, 1, 1] = INFINIT_A  # interior cluster: no Dirichlet contact
    a[1, 0, 0] = 1e6        # boundary-touching: stays on the fast path
    for cluster_method in ("host", "device"):
        got, info = sharded_solve_pallas(
            space, a, mesh, tol=1e-10, return_info=True,
            cluster_method=cluster_method)
        r = np.asarray(space.load)[None] - np.asarray(
            st.apply_operator_flat(space.weights(jnp.asarray(a)),
                                   jnp.asarray(got), space.grid_shape)
        ).reshape(10, -1)
        rel = np.linalg.norm(r, axis=-1) / np.linalg.norm(
            np.asarray(space.load))
        # cluster sample: eps*kappa class (kappa ~ 1e12); clean rows: gated
        assert rel[0] < 5e-4, rel
        assert np.max(rel[1:]) < 1e-9, rel


def test_sharded_training_step_pallas(mesh):
    """The dryrun's training step exercises the production kernel path."""
    space = FemSpace((2, 2), 4)
    a = np.ones((16, 2, 2))
    a[::2, 0, 0] = INFINIT_A
    a_sharded, _ = shard_batch(a, mesh)
    step = sharded_training_step(space, mesh, method="pallas", tol=1e-10)
    sols, h1, gram, ix = step(a_sharded)
    want = np.asarray(space.solve(a, method="pallas", tol=1e-10,
                                  interior_clusters=False))
    np.testing.assert_allclose(np.asarray(sols), want, rtol=1e-9,
                               atol=1e-12)
    assert int(ix) == int(np.argmax(np.asarray(h1)))


def test_sharded_training_step(mesh):
    space = FemSpace((2, 2), 4)
    a = np.ones((16, 2, 2))
    a[::2, 0, 0] = INFINIT_A
    a_sharded, _ = shard_batch(a, mesh)
    step = sharded_training_step(space, mesh)
    sols, h1, gram, ix = step(a_sharded)
    assert sols.shape == (16, space.vspace_dim)
    assert np.all(np.isfinite(np.asarray(sols)))
    # gram is consistent with the gathered solutions
    s = np.asarray(sols)
    np.testing.assert_allclose(np.asarray(gram), s @ s.T, rtol=1e-9)
    # argmax matches a local computation
    assert int(ix) == int(np.argmax(np.asarray(h1)))


def test_graft_entry_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_experiment_driver_on_mesh(tmp_path, mesh):
    """Stage-1 snapshot generation sharded over the 8-device mesh inside the
    full experiment pipeline."""
    from romhighcontrast_tpu.experiments.driver import experiment
    from romhighcontrast_tpu.rom.builders import RandomBuilder

    res = experiment(
        name="meshed",
        reduced_basis_builders=[RandomBuilder()],
        mesh_discretization_per_dim=3,
        diff_coef_refinement=3,
        vn_max_dim=2,
        num_measurements=8,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=20,
        seed=0,
        verbose=False,
        results_dir=tmp_path,
        mesh=mesh,
    )
    sols = res.store["solutions"]
    assert sols.shape[1] == res.space.vspace_dim
    assert np.all(np.isfinite(sols))
    # matches the single-device result
    want = np.asarray(res.space.solve(res.a))
    np.testing.assert_allclose(sols, want, rtol=1e-9, atol=1e-14)


def test_experiment_driver_on_mesh_pallas(tmp_path, mesh):
    """Full experiment() with method='pallas' and a mesh: stage-1 snapshots
    run through the shard_map'd flagship kernel (VERDICT r4 #1 'Done'
    criterion), and the pipeline matches single-device."""
    from romhighcontrast_tpu.experiments.driver import experiment
    from romhighcontrast_tpu.rom.builders import RandomBuilder

    res = experiment(
        name="meshed_pallas",
        reduced_basis_builders=[RandomBuilder()],
        mesh_discretization_per_dim=3,
        diff_coef_refinement=3,
        vn_max_dim=2,
        num_measurements=8,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=20,
        seed=0,
        verbose=False,
        results_dir=tmp_path,
        mesh=mesh,
        method="pallas",
    )
    sols = res.store["solutions"]
    assert sols.shape[1] == res.space.vspace_dim
    assert np.all(np.isfinite(sols))
    want = np.asarray(res.space.solve(res.a, method="pallas"))
    np.testing.assert_allclose(sols, want, rtol=1e-9, atol=1e-12)


def test_greedy_on_sharded_training_set(mesh):
    """The greedy builder works transparently on mesh-sharded training data
    (XLA propagates the batch sharding through the padded reduced solves;
    the argmax is a cross-device reduction) and selects the same basis."""
    from romhighcontrast_tpu.rom.builders import GreedyBuilder
    from romhighcontrast_tpu.parallel.mesh import batch_sharding

    space = FemSpace((2, 2), 5)
    c = 1 / np.linspace(1 / INFINIT_A, 1, 16, endpoint=False)
    a = np.ones((16, 2, 2))
    a[:, 1, 0] = c
    sols = space.solve(a)
    h1 = space.h10_norm(sols)

    rb_local = GreedyBuilder().build(
        n=4, sm=space, solutions2train=sols, a2train=jnp.asarray(a),
        solutions2train_h1norm=h1,
    )
    sols_sh = jax.device_put(sols, batch_sharding(mesh))
    a_sh = jax.device_put(jnp.asarray(a), batch_sharding(mesh))
    h1_sh = jax.device_put(h1, batch_sharding(mesh))
    rb_sh = GreedyBuilder().build(
        n=4, sm=space, solutions2train=sols_sh, a2train=a_sh,
        solutions2train_h1norm=h1_sh,
    )
    np.testing.assert_array_equal(np.asarray(rb_local.a), np.asarray(rb_sh.a))
    np.testing.assert_allclose(
        np.asarray(rb_local.basis), np.asarray(rb_sh.basis), rtol=1e-12
    )

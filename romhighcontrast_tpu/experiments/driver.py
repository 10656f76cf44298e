"""The paper experiment pipeline (reference: experiment(),
HighContrast.py:118-215).

Stages (each checkpointed, idempotent re-entry):
  1. contrast grid + corner set -> batched FOM snapshot solve (one tensor
     program on the device mesh; the reference maps scipy solves per point),
  2. measurement sampling + evaluation-operator matmul,
  3. per-builder reduced-basis construction,
  4. per-dimension n: the five online problems, relative H10 errors and
     wall-clock timings per problem type.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.config import results_path
from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.experiments.grids import get_a2test_and_train
from romhighcontrast_tpu.experiments.persistence import ExperimentStore
from romhighcontrast_tpu.rom.builders import (
    GreedyBuilder,
    RandomBuilder,
    GREEDY_FOR_GALERKIN,
    GREEDY_FOR_H10,
)


class TypeOfProblems(NamedTuple):
    """The five online problems (reference: HighContrast.py:28-29)."""

    forward_modeling: object
    projection: object
    state_estimation: object
    parameter_estimation_inverse: object
    parameter_estimation_linear: object


class RBErrorDataType(NamedTuple):
    """Per-basis error record (reference: HighContrast.py:30)."""

    ReducedBasisName: str
    ReducedBasis: object
    a2test: object
    errors: object


def default_builders():
    """The paper's four builders (reference: HighContrast.py:37-42)."""
    return [
        RandomBuilder(),
        RandomBuilder(False),
        GreedyBuilder(greedy_for=GREEDY_FOR_H10),
        GreedyBuilder(greedy_for=GREEDY_FOR_GALERKIN),
    ]


def _timed(fn, *args, **kwargs):
    t0 = time.time()
    out = fn(*args, **kwargs)
    jnp_out = out[0] if isinstance(out, tuple) else out
    try:
        jnp_out.block_until_ready()
    except AttributeError:
        pass
    return time.time() - t0, out


@dataclass
class ExperimentResult:
    space: object
    store: ExperimentStore
    a: np.ndarray
    a_high_contrast: np.ndarray
    builders: Sequence = field(default_factory=list)

    @property
    def bases(self) -> dict:
        """The built reduced bases keyed by builder name."""
        return {rb.name: rb for rb in self.builders}


def experiment(
    name: str,
    reduced_basis_builders=None,
    mesh_discretization_per_dim: int = 6,
    diff_coef_refinement: int = 30,
    vn_max_dim: int = 20,
    num_measurements: int = 50,
    blocks_geometry=(4, 4),
    high_contrast_blocks=(((1, 1), (1, 2), (2, 1), (2, 2)),),
    vn_max_dim2do_stats: int | None = None,
    recalculate: bool = False,
    max_num_samples_offline: int = 10_000,
    seed: int = 42,
    recalculate_basis: bool = False,
    method: str = "mixed",
    verbose: bool = True,
    results_dir=None,
    mesh=None,
) -> ExperimentResult:
    """Run the full offline+online pipeline for one experiment configuration.

    Mirrors the reference's ``experiment()`` signature and staging
    (HighContrast.py:118-215); ``method`` accepts the reference aliases
    ("lsq" -> dense Cholesky, "lsqsparse" -> stencil PCG).  Pass a
    ``jax.sharding.Mesh`` (e.g. ``parallel.data_mesh()``) to shard the
    snapshot axis over the device mesh.
    """
    reduced_basis_builders = (
        default_builders() if reduced_basis_builders is None else reduced_basis_builders
    )
    vn_max_dim2do_stats = (
        vn_max_dim if vn_max_dim2do_stats is None else vn_max_dim2do_stats
    )
    from pathlib import Path

    # resolve the default from the ENV at call time (not import time) so
    # test fixtures and notebook runs can redirect persistence per call
    import os as _os

    base = (Path(_os.environ.get("ROMHC_RESULTS_PATH", results_path))
            if results_dir is None else Path(results_dir))
    store = ExperimentStore(base / f"HighContrast_{name}")
    if verbose:
        print(f"========== experiment {name} -> {store.folder} ==========")

    space, a, a_high_contrast = get_a2test_and_train(
        blocks_geometry,
        high_contrast_blocks,
        mesh_discretization_per_dim,
        diff_coef_refinement,
        max_num_samples_offline,
        seed,
        method,
    )
    if verbose:
        print(f"Solutions to calculate: {len(a_high_contrast)} (dim {space.vspace_dim})")

    # ---------------- stage 1: snapshots ---------------- #
    if recalculate or "solutions" not in store:
        if mesh is not None:
            from romhighcontrast_tpu.parallel import sharded_snapshot_solve

            t, sols = _timed(sharded_snapshot_solve, space, a, mesh)
        else:
            t, sols = _timed(space.solve, jnp.asarray(a))
        store["time2calculate_solutions"] = t
        store["solutions"] = np.asarray(sols)
        t, h1 = _timed(space.h10_norm, sols)
        store["time2calculate_h1norm"] = t
        store["solutions_H1norm"] = np.asarray(h1)
        store.save(wait=False)
        if verbose:
            print(f"{len(a)} snapshots in {store['time2calculate_solutions']:.3f}s "
                  f"({len(a)/store['time2calculate_solutions']:.1f}/s)")
    solutions = jnp.asarray(store["solutions"])
    h1norms = jnp.asarray(store["solutions_H1norm"])

    # ---------------- stage 2: measurements ---------------- #
    # reference samples uniform [0,1]^2 regardless of the domain
    # (HighContrast.py:155), CONTINUING the numpy stream seeded (and
    # partially consumed by the grid subsample) inside get_a2test_and_train
    # — re-seeding here would diverge from the reference stream whenever the
    # contrast grid was subsampled.
    measurement_points = np.random.uniform(size=(num_measurements, 2))
    measurements = space.evaluate_solutions(measurement_points, solutions)

    # ---------------- stage 3: reduced bases ---------------- #
    bases = {}
    for builder in reduced_basis_builders:
        key = builder.name
        entry = store.setdefault(key, {})
        have = entry.get("basis")
        if have is None or have.shape[0] < vn_max_dim or recalculate_basis:
            if verbose:
                print(f"Building reduced basis: {key}")
            t, rb = _timed(
                builder.build,
                n=vn_max_dim,
                sm=space,
                solutions2train=solutions,
                a2train=jnp.asarray(a),
                solutions2train_h1norm=h1norms,
            )
            entry["time2build"] = t
            entry["basis"] = np.asarray(rb.basis)
            entry["basis_a"] = np.asarray(rb.a)
            # a rebuilt basis invalidates cached statistics (reference resets
            # data[name] = {"errors": {}, ...} on rebuild, HighContrast.py:164)
            entry["errors"] = {}
            entry["times"] = {}
            store.save(wait=False)
            bases[key] = rb
        else:
            from romhighcontrast_tpu.rom.basis import ReducedBasis

            bases[key] = ReducedBasis(name=key).set(
                basis=jnp.asarray(entry["basis"]), a=jnp.asarray(entry["basis_a"])
            )

    # ---------------- stage 4: errors & timings ---------------- #
    # Shape discipline: every n from 1..vn_max_dim reuses ONE compiled
    # program per problem type — the basis is zero-padded to vn_max_dim with
    # an active-row mask (forward_reduced_padded / project_padded).  The
    # per-n small algebra (lstsq, estimators, sorted QR) runs on host numpy:
    # it is microscopic, and per-shape device compiles would dominate the
    # stage (remote TPU compiles are ~30s each).
    a_dev = jnp.asarray(a)
    a_np = np.asarray(a)

    # one fused program for the three H10 error curves of an (n, builder)
    # cell: eagerly dispatched norm chains cost milliseconds per op on the
    # remote backend, and this loop runs vn_max_dim * n_builders times
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("grid_shape",))
    def _rel_h10_errors(w1, fm, pj, se, sols, h1, grid_shape):
        def h10(u):
            return jnp.sqrt(jnp.maximum(
                jnp.sum(u * st.apply_operator_flat(w1, u, grid_shape), -1),
                0.0))
        # one stacked output -> ONE device->host conversion per cell
        return jnp.stack(
            [h10(fm - sols) / h1, h10(pj - sols) / h1, h10(se - sols) / h1]
        )
    padded_ok = hasattr(space, "forward_reduced_padded")
    basis_eval = {
        key: np.asarray(
            space.evaluate_solutions(measurement_points, bases[key].basis)
        )
        for key in bases
    }
    # cache the per-builder host copies once: per-cell np.asarray(rb.basis)
    # costs a sync + transfer, and the lifts below run on device anyway
    basis_np = {key: np.asarray(bases[key].basis) for key in bases}
    basis_a_np = {key: np.asarray(bases[key].a) for key in bases}
    meas_np = np.asarray(measurements)

    for n in range(1, vn_max_dim + 1):
        for key, full_rb in bases.items():
            entry = store[key]
            errors = entry.setdefault("errors", {})
            times = entry.setdefault("times", {})
            nkey = str(n)
            if n > vn_max_dim2do_stats or (not recalculate and nkey in errors):
                continue
            if verbose:
                print(f"dim(Vn)={n} [{key}]")
            rb = full_rb[:n]
            rb_basis_np = basis_np[key][:n]
            rb_a_np = basis_a_np[key][:n]

            # state estimation: host lstsq on the tiny (m, n) system, then
            # the (k, n) @ (n, dim) coefficient lift on DEVICE — on this
            # single-core host the lift alone costs seconds per cell
            t0 = time.time()
            Phi = basis_eval[key][:n]  # (n, m)
            c = np.linalg.lstsq(Phi.T, meas_np.T, rcond=None)[0]  # (n, k)
            se_sol = jnp.asarray(c.T) @ jnp.asarray(rb.basis)
            # checksum, not block_until_ready: the axon tunnel's block has
            # been observed to return early (CLAUDE.md timing note)
            float(jnp.sum(se_sol))
            se_t = time.time() - t0
            t0 = time.time()
            inv_params = 1.0 / np.einsum("bi,b...->i...", c, 1.0 / rb_a_np)
            inv_t = time.time() - t0
            t0 = time.time()
            lin_params = np.einsum("bi,b...->i...", c, rb_a_np)
            lin_t = time.time() - t0

            # contrast-sorted orthonormalisation on host (reference:
            # ReducedBasis.py:94-98), then fixed-shape padded device solves
            hc = np.max(rb_a_np, axis=(-2, -1))
            order = np.argsort(1.0 / hc)
            q, _ = np.linalg.qr(rb_basis_np[order].T)
            V = q.T  # (n, dim) orthonormal
            if padded_ok:
                V_pad = np.zeros((vn_max_dim, V.shape[1]))
                V_pad[:n] = V
                mask = np.zeros(vn_max_dim)
                mask[:n] = 1.0
                fm_t, fm_sol = _timed(
                    space.forward_reduced_padded, a_dev, V_pad, mask
                )
                pj_t, pj_sol = _timed(space.project_padded, solutions, V_pad, mask)
            else:
                fm_t, fm_sol = _timed(space.forward_reduced, a_dev, V)
                pj_t, pj_sol = _timed(space.project, solutions, V)

            errs3 = np.asarray(_rel_h10_errors(
                space._ones_weights, fm_sol, pj_sol, se_sol,
                jnp.asarray(solutions), jnp.asarray(h1norms),
                space.grid_shape,
            ))
            errors[nkey] = TypeOfProblems(
                forward_modeling=errs3[0],
                projection=errs3[1],
                state_estimation=errs3[2],
                parameter_estimation_inverse=np.abs(1 - inv_params / a_np),
                parameter_estimation_linear=np.abs(1 - lin_params / a_np),
            )._asdict()
            times[nkey] = TypeOfProblems(
                forward_modeling=fm_t,
                projection=pj_t,
                state_estimation=se_t,
                parameter_estimation_inverse=inv_t,
                parameter_estimation_linear=lin_t,
            )._asdict()
            store.save(wait=False)

    store.finalize()  # all checkpoints durable before returning
    return ExperimentResult(
        space=space,
        store=store,
        a=a,
        a_high_contrast=a_high_contrast,
        builders=list(bases.values()),
    )

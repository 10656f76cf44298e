"""LabPipeline-equivalent orchestration: cartesian variants, context flow,
caching, and an end-to-end inverse-pipeline composition."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace
from romhighcontrast_tpu.experiments.persistence import ExperimentStore
from romhighcontrast_tpu.experiments.pipeline import FunctionBlock, LabPipeline


def test_cartesian_expansion_and_context_flow():
    pipe = LabPipeline()
    pipe.define_new_block_of_functions("init", lambda x: {"y": x + 1})
    pipe.define_new_block_of_functions(
        "scale",
        FunctionBlock("double", lambda y: {"z": 2 * y}),
        FunctionBlock("triple", lambda y: {"z": 3 * y}),
    )
    results = pipe.execute(x=[1, 10])
    assert len(results) == 4
    got = {(r["x"], r["__variants__"]["scale"]): r["z"] for r in results}
    assert got == {(1, "double"): 4, (1, "triple"): 6,
                   (10, "double"): 22, (10, "triple"): 33}


def test_pipeline_caching(tmp_path):
    calls = {"n": 0}

    def expensive(x):
        calls["n"] += 1
        return {"y": np.asarray(x * 2.0)}

    store = ExperimentStore(tmp_path / "pipe")
    pipe = LabPipeline()
    pipe.define_new_block_of_functions("stage", expensive)
    pipe.execute(store=store, x=[3])
    pipe.execute(store=store, x=[3])
    assert calls["n"] == 1  # second run served from cache

    # fresh store object re-reads from disk
    store2 = ExperimentStore(tmp_path / "pipe")
    pipe.execute(store=store2, x=[3])
    assert calls["n"] == 1


def test_inverse_pipeline_composition():
    """The tutorial's offline/online staged pipeline, composed from the
    framework's pieces (reference: InverseProblemPipeline.ipynb cell 65)."""
    from romhighcontrast_tpu.inverse import (
        MEASUREMENT_SAMPLERS,
        STATE_ESTIMATORS,
        sample_solution_uniform,
    )
    from romhighcontrast_tpu.rom.builders import PCABuilder, RandomBuilder

    def define_fem(blocks_geometry, n_per_dim):
        return {"sm": FemSpace(tuple(blocks_geometry), n_per_dim)}

    def sample_manifold(sm, n_solutions):
        a = sample_solution_uniform(n_solutions, 1, 50, 4, seed=0).reshape(
            -1, *sm.blocks_geometry
        )
        return {"a": a, "solutions": sm.solve(a)}

    def make_basis_block(builder):
        def basis(sm, solutions, a, max_vn_dim):
            rb = builder.build(n=max_vn_dim, sm=sm,
                               solutions2train=solutions,
                               a2train=jnp.asarray(a))
            return {"basis": np.asarray(rb.basis)}

        return basis

    def sensors(sm, basis, m):
        pts = MEASUREMENT_SAMPLERS["Grid"](m, sm.x_domain, sm.y_domain,
                                           basis=basis, sm=sm)
        return {"measurement_points": pts}

    def measure(sm, measurement_points, solutions):
        return {
            "measurements": np.asarray(
                sm.evaluate_solutions(measurement_points, solutions)
            )
        }

    def estimate(sm, measurement_points, measurements, basis, n):
        est = STATE_ESTIMATORS["least-squares"](
            measurement_points=measurement_points, measurements=measurements,
            reduced_basis=basis[:n], sm=sm,
        )
        return {"approx": np.asarray(est)}

    pipe = LabPipeline()
    pipe.define_new_block_of_functions("space", define_fem)
    pipe.define_new_block_of_functions("sample", sample_manifold)
    pipe.define_new_block_of_functions(
        "basis_gen",
        FunctionBlock("PCA", make_basis_block(PCABuilder(False))),
        FunctionBlock("Random", make_basis_block(RandomBuilder(False))),
    )
    pipe.define_new_block_of_functions("sensors", sensors)
    pipe.define_new_block_of_functions("measure", measure)
    pipe.define_new_block_of_functions("estimate", estimate)

    results = pipe.execute(
        blocks_geometry=[(2, 2)], n_per_dim=[4], n_solutions=[20],
        max_vn_dim=[5], m=[25], n=[3, 5],
    )
    assert len(results) == 4  # 2 basis variants x 2 values of n
    for r in results:
        sm = r["sm"]
        err = np.asarray(
            sm.h10_norm(jnp.asarray(r["approx"]) - jnp.asarray(r["solutions"]))
            / sm.h10_norm(r["solutions"])
        )
        assert np.isfinite(err).all()
    # PCA at n=5 beats Random at n=3 (sanity ordering)
    def max_err(r):
        sm = r["sm"]
        return float(np.max(np.asarray(
            sm.h10_norm(jnp.asarray(r["approx"]) - jnp.asarray(r["solutions"]))
            / sm.h10_norm(r["solutions"]))))

    pca5 = [r for r in results
            if r["__variants__"]["basis_gen"] == "PCA" and r["n"] == 5][0]
    rnd3 = [r for r in results
            if r["__variants__"]["basis_gen"] == "Random" and r["n"] == 3][0]
    assert max_err(pca5) <= max_err(rnd3) * 1.5

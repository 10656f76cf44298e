"""Sharded snapshot generation and the distributed pieces of RB construction.

Everything here is plain ``jit`` over sharded inputs: XLA's SPMD partitioner
propagates the batch sharding through the stencil PCG (purely elementwise +
per-sample reductions, so no resharding happens inside the solve) and inserts
the collectives only where the algorithm genuinely needs them — error
statistics (psum) and the greedy argmax (global value-and-index reduction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from romhighcontrast_tpu.parallel.mesh import DATA_AXIS, batch_sharding, shard_batch


def sharded_snapshot_solve(space, a_batch, mesh: Mesh, **solve_kwargs):
    """Batched FOM solve with the parameter axis sharded over the mesh.

    Returns solutions with the same sharding (leading axis over ``data``).
    """
    a_sharded, n = shard_batch(a_batch, mesh)
    out_shardings = batch_sharding(mesh)

    @partial(jax.jit, out_shardings=out_shardings)
    def _solve(a):
        return space.solve(a, **solve_kwargs)

    return _solve(a_sharded)[:n]


def distributed_argmax_error(space, approx, truth, h1norms):
    """Greedy selection reduction: index of the max relative H10 error.

    Works transparently on sharded inputs: the H10 norm is per-sample local;
    the argmax lowers to a cross-device value-and-index reduction.
    """
    rel = space.h10_norm(approx - truth) / h1norms
    return jnp.argmax(rel), rel


def sharded_training_step(space, mesh: Mesh, n_basis: int = 4):
    """One full 'training step' of the offline pipeline, jitted over the mesh
    with real data-parallel shardings — used by the multi-chip dry run.

    Given sharded parameters: solve all snapshots (data-sharded), compute
    H10 norms (local), assemble the snapshot Gram for POD (psum over the
    sharded contraction), and run one greedy-style global argmax. Returns a
    function and example sharded args.
    """
    dshard = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(dshard,),
        out_shardings=(dshard, dshard, rep, rep),
    )
    def step(a_batch):
        sols = space.solve(a_batch)
        h1 = space.h10_norm(sols)
        # snapshot Gram for POD: contraction over the sharded dim axis
        gram = sols @ sols.T  # (b, b) — XLA inserts the collective
        # greedy-style selection: worst-approximated snapshot with empty basis
        ix = jnp.argmax(h1)
        return sols, h1, gram, ix

    return step

"""Sharded snapshot generation and the distributed pieces of RB construction.

Two sharding mechanisms, chosen per solve method:

* **Plain ``jit`` over sharded inputs** (the XLA ``"mixed"``/``"pcg"``
  family): XLA's SPMD partitioner propagates the batch sharding through the
  stencil PCG (purely elementwise + per-sample reductions, so no resharding
  happens inside the solve) and inserts the collectives only where the
  algorithm genuinely needs them — error statistics (psum) and the greedy
  argmax (global value-and-index reduction).
* **``jax.shard_map``** (the flagship fused Pallas family,
  ``method="pallas"``): a ``pallas_call`` is an opaque custom call the SPMD
  partitioner cannot split, so the phased two-level driver runs *per device*
  on its local batch shard under ``shard_map``.  The solve is embarrassingly
  parallel over samples — the per-shard phased driver (difficulty-sorted
  blocks, compact straggler phase) needs no collectives at all; only the
  downstream statistics/argmax do, and those ride plain jit outside the map.

This pair replaces-in-kind the reference's process pools
(/root/reference/src/lib/SolutionsManagers.py:51,
/root/reference/src/experiments/HighContrast.py:527).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from romhighcontrast_tpu.parallel.mesh import DATA_AXIS, batch_sharding, shard_batch


def _is_pallas(space, solve_kwargs) -> bool:
    m = solve_kwargs.get("method") or getattr(space, "method", "mixed")
    return str(m).lower().startswith("pallas")


def sharded_snapshot_solve(space, a_batch, mesh: Mesh, **solve_kwargs):
    """Batched FOM solve with the parameter axis sharded over the mesh.

    Routes by method: the fused Pallas family goes through
    :func:`sharded_solve_pallas` (``shard_map`` — SPMD cannot partition a
    ``pallas_call``); the XLA family stays plain jit over sharded inputs.
    Returns solutions with the same sharding (leading axis over ``data``).
    """
    if _is_pallas(space, solve_kwargs):
        return sharded_solve_pallas(space, a_batch, mesh, **solve_kwargs)

    a_sharded, n = shard_batch(a_batch, mesh)
    out_shardings = batch_sharding(mesh)

    @partial(jax.jit, out_shardings=out_shardings)
    def _solve(a):
        return space.solve(a, **solve_kwargs)

    return _solve(a_sharded)[:n]


def sharded_solve_pallas(
    space,
    a_batch,
    mesh: Mesh,
    method: str = "pallas",
    tol: float = 1e-11,
    maxiter: int = 5_000,
    inner_opts: tuple = (),
    return_info: bool = False,
    cluster_method: str | None = None,
):
    """The flagship fused-Pallas solve, data-parallel over the device mesh.

    Each device runs the full phased two-level driver
    (``ops.solvers._mixed_2l_phased``) on its local batch shard inside
    ``jax.shard_map`` — the kernel path that produces the headline
    throughput, now multi-chip.  Interior-stiff-cluster samples are detected
    on host over the GLOBAL batch (exactly as ``FemSpace.solve`` does
    single-device) and routed to the real-f64 host direct solver
    (``ops.host_lu``), overlapped with the asynchronous sharded device
    dispatch; the device fast path runs the full padded batch so every
    shard keeps one canonical shape.

    Batch padding: rows of ``a = 1`` (never adds clusters) up to a multiple
    of the mesh size; results are sliced back to the true length.
    """
    from romhighcontrast_tpu.ops import clusters as cl
    from romhighcontrast_tpu.ops import solvers

    a_np = np.asarray(a_batch)
    if a_np.ndim == 2:
        out = sharded_solve_pallas(
            space, a_np[None], mesh, method=method, tol=tol,
            maxiter=maxiter, inner_opts=inner_opts,
            return_info=return_info, cluster_method=cluster_method)
        if return_info:
            x, info = out
            return x[0], solvers.PCGInfo(
                iterations=info.iterations[0],
                relative_residual=info.relative_residual[0])
        return out[0]
    B0 = a_np.shape[0]
    ndev = mesh.devices.size
    pad = (-B0) % ndev
    if pad:
        a_np = np.concatenate(
            [a_np, np.ones((pad,) + a_np.shape[1:], a_np.dtype)], axis=0)
    dshard = batch_sharding(mesh)
    a_dev = jax.device_put(jnp.asarray(a_np, space.dtype), dshard)

    def _local(a_loc):
        x, info = space.solve(
            a_loc, method=method, tol=tol, maxiter=maxiter,
            interior_clusters=False, inner_opts=inner_opts,
            return_info=True,
        )
        return x, info

    spec = P(DATA_AXIS)
    shard_mapped = jax.shard_map(
        _local, mesh=mesh, in_specs=spec,
        out_specs=(spec, solvers.PCGInfo(iterations=spec,
                                         relative_residual=spec)),
        # pallas_call outputs carry no varying-mesh-axes metadata; the body
        # is purely per-sample so the data-axis variance is ours to declare
        check_vma=False,
    )
    # dispatch the (asynchronous) sharded fast path FIRST, then factorize
    # any cluster bucket on the host while the devices work
    x, info = jax.jit(shard_mapped, out_shardings=(
        dshard, solvers.PCGInfo(iterations=dshard,
                                relative_residual=dshard)))(a_dev)

    has = cl.has_interior_cluster(a_np)
    idx_c = np.where(has)[0]
    if len(idx_c):
        if cluster_method is None:
            cluster_method = ("host" if jax.default_backend() != "cpu"
                              else "device")
        if cluster_method == "host":
            from romhighcontrast_tpu.ops import host_lu

            xc_np, res_c = host_lu.solve_banded_batch(
                a_np[idx_c], space.N, np.asarray(space.load))
            xc = jnp.asarray(xc_np.reshape(len(idx_c), -1), space.dtype)
            rc = jnp.asarray(res_c, space.dtype)
            ic = jnp.zeros((len(idx_c),), jnp.int32)
        else:
            # device route: the f64 BNN-deflated solver is pure XLA — plain
            # jit SPMD over the gathered bucket (no shard_map needed)
            xc, inf_c = space.solve(
                jnp.asarray(a_np[idx_c], space.dtype), tol=tol,
                maxiter=maxiter, method="mixed", interior_clusters=True,
                return_info=True)
            rc = inf_c.relative_residual
            ic = inf_c.iterations.astype(jnp.int32)
        x = x.at[idx_c].set(xc)
        info = solvers.PCGInfo(
            iterations=info.iterations.at[idx_c].set(ic),
            relative_residual=info.relative_residual.at[idx_c].set(rc),
        )

    x = x[:B0]
    if return_info:
        return x, solvers.PCGInfo(
            iterations=info.iterations[:B0],
            relative_residual=info.relative_residual[:B0],
        )
    return x


def distributed_argmax_error(space, approx, truth, h1norms):
    """Greedy selection reduction: index of the max relative H10 error.

    Works transparently on sharded inputs: the H10 norm is per-sample local;
    the argmax lowers to a cross-device value-and-index reduction.
    """
    rel = space.h10_norm(approx - truth) / h1norms
    return jnp.argmax(rel), rel


def sharded_training_step(space, mesh: Mesh, n_basis: int = 4,
                          method: str | None = None, tol: float = 1e-11):
    """One full 'training step' of the offline pipeline, jitted over the mesh
    with real data-parallel shardings — used by the multi-chip dry run.

    Given sharded parameters: solve all snapshots (data-sharded; the fused
    Pallas flagship runs per-device under ``shard_map`` when
    ``method="pallas"``), compute H10 norms (local), assemble the snapshot
    Gram for POD (psum over the sharded contraction), and run one
    greedy-style global argmax. Returns a function taking sharded args.
    """
    dshard = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    pallas = str(method or getattr(space, "method", "mixed")
                 ).lower().startswith("pallas")
    spec = P(DATA_AXIS)

    def _solve_local(a_batch):
        return space.solve(a_batch, method=method, tol=tol,
                           interior_clusters=False)

    @partial(
        jax.jit,
        in_shardings=(dshard,),
        out_shardings=(dshard, dshard, rep, rep),
    )
    def step(a_batch):
        if pallas:
            # the production kernel path: per-device phased driver
            sols = jax.shard_map(_solve_local, mesh=mesh, in_specs=spec,
                                 out_specs=spec, check_vma=False)(a_batch)
        else:
            sols = space.solve(a_batch, tol=tol)
        h1 = space.h10_norm(sols)
        # snapshot Gram for POD: contraction over the sharded dim axis
        gram = sols @ sols.T  # (b, b) — XLA inserts the collective
        # greedy-style selection: worst-approximated snapshot with empty basis
        ix = jnp.argmax(h1)
        return sols, h1, gram, ix

    return step

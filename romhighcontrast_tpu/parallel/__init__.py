"""Multi-chip scaling over the device mesh.

The reference's only parallelism is single-node process pools over parameter
points / experiment configs (pathos/multiprocessing; reference:
SolutionsManagers.py:51, HighContrast.py:527) — share-nothing data
parallelism with no inter-worker communication, which the author measured as
*slower* than serial due to operator pickling (HighContrast.py:508-511).

TPU-native equivalent: shard the parameter/snapshot axis over a
``jax.sharding.Mesh`` of ICI-connected chips; the only collectives the
algorithms need are ``all_gather``/``psum`` for error statistics and a global
argmax (value-and-index reduction) inside greedy selection.
"""

from romhighcontrast_tpu.parallel.mesh import data_mesh, shard_batch
from romhighcontrast_tpu.parallel.sharding import (
    distributed_argmax_error,
    sharded_snapshot_solve,
    sharded_solve_pallas,
    sharded_training_step,
)

__all__ = [
    "data_mesh",
    "shard_batch",
    "distributed_argmax_error",
    "sharded_snapshot_solve",
    "sharded_solve_pallas",
    "sharded_training_step",
]

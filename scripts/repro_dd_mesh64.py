"""Reproduce the mesh-64 dd-kernel compile failure and print the FULL error."""
import traceback

import jax
import jax.numpy as jnp

from romhighcontrast_tpu.benchmarks import _paper_problem


def main():
    print("devices:", jax.devices(), flush=True)
    space, a = _paper_problem(64, 16)
    a = jnp.asarray(a)
    try:
        sols = space.solve(a, method="pallas", tol=1e-10,
                           inner_opts=(("phase_a", "dd"),))
        print("OK", float(jnp.sum(sols)), flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()

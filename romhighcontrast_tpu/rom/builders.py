"""Reduced-basis builders: weak greedy (two flavors), random, POD/PCA,
with infinite-contrast seeding (reference: src/lib/ReducedBasis.py:101-200).

TPU design notes:

* Each greedy iteration evaluates the surrogate error of the *entire*
  training set as one batched reduced solve + batched H10 norm on device;
  only the argmax index crosses to the host (the loop over n ~ 15 iterations
  is inherently sequential — data-dependent selection).  On a device mesh the
  training axis shards and the argmax becomes a cross-device reduction
  (``parallel.sharding``).
* POD is an SVD of the (centered) snapshot matrix on device, replacing
  sklearn PCA (reference: ReducedBasis.py:183-200).
* Random selection and seeding replicate the reference's numpy RNG streams on
  host for reproducibility parity (np.random.seed(seed) + choice).
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.config import INFINIT_A
from romhighcontrast_tpu.rom.basis import (
    ReducedBasis,
    get_high_contrast_coefficient,
)

GREEDY_FOR_H10 = r"$H^1_0$"
GREEDY_FOR_GALERKIN = "galerkin"

logger = logging.getLogger(__name__)


def orthonormalize_padded(snaps: jnp.ndarray, n: int) -> jnp.ndarray:
    """QR-orthonormalise k snapshot rows into a fixed-width (n, dim) padded
    basis (rows >= k are zero).  The QR input shape is (dim, n) regardless of
    k, so the compiled program is reused across greedy iterations."""
    k, dim = snaps.shape
    Vt = jnp.zeros((dim, n), snaps.dtype).at[:, :k].set(snaps.T)
    q, _ = jnp.linalg.qr(Vt)
    act = (jnp.arange(n) < k).astype(snaps.dtype)
    return q.T * act[:, None]


def get_inf_solutions_starting_basis(solutions2train, a2train, only_one_block=True):
    """Split the training set into infinite-contrast snapshots (seed basis)
    and the rest (reference: ReducedBasis.py:142-150)."""
    a2train = jnp.asarray(a2train)
    solutions2train = jnp.asarray(solutions2train)
    num_hc_blocks = np.sum(np.asarray(a2train) == INFINIT_A, axis=(-1, -2))
    mask = (num_hc_blocks == 1) if only_one_block else (num_hc_blocks != 0)
    chosen_ix = np.ravel(np.where(mask))
    free_ix = np.ravel(np.where(~mask))
    return (
        solutions2train[chosen_ix],
        a2train[chosen_ix],
        solutions2train[free_ix],
        a2train[free_ix],
    )


def get_starting_basis(solutions2train, a2train, add_inf_solutions=True):
    """Seed basis selection (reference: ReducedBasis.py:153-164).

    Reference quirk preserved: with ``add_inf_solutions=False`` the
    infinite-contrast snapshots are *still removed* from the candidate pool
    (both branches call the splitter with ``only_one_block=False``); the seed
    is just reset to empty.
    """
    basis, a, solutions2train, a2train = get_inf_solutions_starting_basis(
        solutions2train, a2train, only_one_block=False
    )
    if not add_inf_solutions:
        basis = jnp.empty((0, solutions2train.shape[1]), solutions2train.dtype)
        a = jnp.empty((0,) + a2train.shape[1:], a2train.dtype)
    return basis, a, solutions2train, a2train


class RandomBuilder(ReducedBasis):
    """Seeded random snapshot selection, optionally seeded with the
    infinite-contrast solutions (reference: ReducedBasisRandom,
    ReducedBasis.py:167-180)."""

    def __init__(self, add_inf_solutions: bool = True):
        self.add_inf_solutions = add_inf_solutions
        super().__init__(name="Random" + (r" $\infty$" if add_inf_solutions else ""))

    def build(self, n, sm, solutions2train, a2train, solutions2train_h1norm=1,
              seed=42, **kwargs):
        basis, a, pool, a_pool = get_starting_basis(
            solutions2train, a2train, self.add_inf_solutions
        )
        np.random.seed(seed)
        chosen_ix = np.random.choice(pool.shape[0], size=n, replace=False)
        self.set(
            basis=jnp.vstack((basis, pool[chosen_ix]))[:n],
            a=jnp.concatenate((a, a_pool[chosen_ix]), axis=0)[:n],
        )
        return self


class PCABuilder(ReducedBasis):
    """POD basis from the snapshot SVD (centered, matching sklearn PCA),
    optionally stacked after the infinite-contrast seeds (reference:
    ReducedBasisPCA, ReducedBasis.py:183-200)."""

    def __init__(self, add_inf_solutions: bool = True, center: bool = True):
        self.add_inf_solutions = add_inf_solutions
        self.center = center
        super().__init__(name="PCA" + (r" $\infty$" if add_inf_solutions else ""))

    def build(self, n, sm, solutions2train, a2train, solutions2train_h1norm=1,
              **kwargs):
        basis, a, pool, a_pool = get_starting_basis(
            solutions2train, a2train, self.add_inf_solutions
        )
        X = jnp.asarray(pool)
        if self.center:
            X = X - jnp.mean(X, axis=0, keepdims=True)
        _, _, Vt = jnp.linalg.svd(X, full_matrices=False)
        components = Vt[:n]
        self.set(
            basis=jnp.vstack((basis, components))[:n],
            a=jnp.concatenate((a, a_pool), axis=0)[:n],
        )
        logger.warning(
            "PCA basis: the stored `a` values are not meaningful for "
            "parameter estimation (reference: ReducedBasis.py:199)."
        )
        return self


@partial(jax.jit, static_argnames=("grid_shape", "galerkin"))
def _greedy_step(w1, wq, load, a_flat, sols, h1, inv_hc, V_pad, mask,
                 selected, count, grid_shape, galerkin):
    """One fused greedy iteration: surrogate solve, error argmax, selection
    append, contrast-sorted re-orthonormalisation — all on device.

    The host loop previously issued ~25 eager dispatches per iteration
    (surrogate solve, the h10-norm chain, argmax readback, gathers, QR);
    on the remote-dispatch backend each costs milliseconds, making the
    greedy build ~40 s warm per study experiment.  Fused, each iteration is
    ONE async dispatch and only the final selected-index vector is read
    back.  Tie-break note: jnp.argsort is stable, np.argsort (quicksort)
    is not, so tie ordering among equal-contrast snapshots may differ from
    the host version — both are valid contrast-sorted QR orders.
    """
    from romhighcontrast_tpu.models.fem import (
        _forward_reduced_padded, _project_padded,
    )
    from romhighcontrast_tpu.ops import stencil as st

    if galerkin:
        approx = _forward_reduced_padded(wq, V_pad, load, a_flat, mask,
                                         grid_shape)
    else:
        approx = _project_padded(w1, V_pad, sols, mask, grid_shape)
    d = approx - sols
    err2 = jnp.maximum(
        jnp.sum(d * st.apply_operator_flat(w1, d, grid_shape), axis=-1), 0.0
    )
    ix = jnp.argmax(jnp.sqrt(err2) / h1).astype(jnp.int32)
    selected = selected.at[count].set(ix)
    count = count + 1
    n = V_pad.shape[0]
    act = jnp.arange(n) < count
    keys = jnp.where(act, inv_hc[selected], jnp.inf)
    order = jnp.argsort(keys)
    act_sorted = act[order]
    snaps = sols[selected[order]] * act_sorted[:, None]
    q, _ = jnp.linalg.qr(snaps.T)
    V_pad = q.T * act_sorted[:, None].astype(V_pad.dtype)
    return V_pad, act.astype(mask.dtype), selected, count


class GreedyBuilder(ReducedBasis):
    """Weak greedy over the training set (reference: ReducedBasisGreedy,
    ReducedBasis.py:105-139).

    Per iteration: surrogate approximations of *all* training snapshots with
    the current (contrast-sorted, orthonormalised) basis — H10 projection for
    the ``GREEDY_FOR_H10`` flavor, reduced Galerkin for
    ``GREEDY_FOR_GALERKIN`` — then select the argmax relative H10 error,
    append, re-sort and re-orthonormalise.
    """

    def __init__(self, greedy_for: str = GREEDY_FOR_GALERKIN):
        if greedy_for not in (GREEDY_FOR_H10, GREEDY_FOR_GALERKIN):
            raise ValueError(
                f"Unknown greedy flavor {greedy_for!r}; expected one of "
                f"[{GREEDY_FOR_H10!r}, {GREEDY_FOR_GALERKIN!r}]"
            )
        self.greedy_for = greedy_for
        self.linestyle = "solid" if greedy_for == GREEDY_FOR_H10 else "dashed"
        super().__init__(name="Greedy " + greedy_for)

    def build(self, n, sm, solutions2train, a2train, solutions2train_h1norm=1,
              progress: bool = False, **kwargs):
        solutions2train = jnp.asarray(solutions2train)
        a2train = jnp.asarray(a2train)
        high_contrast_a = np.asarray(get_high_contrast_coefficient(a2train))

        dim = solutions2train.shape[1]
        padded = hasattr(sm, "forward_reduced_padded")

        if padded:
            # fully device-resident greedy: each iteration is one fused
            # async dispatch (_greedy_step); only the final index vector is
            # read back.  Fixed-width padded basis -> one compiled program
            # for every iteration (the basis "grows" via the mask only).
            dt = solutions2train.dtype
            V_pad = jnp.zeros((n, dim), dt)
            mask = jnp.zeros((n,), dt)
            selected = jnp.zeros((n,), jnp.int32)
            count = jnp.int32(0)
            h1 = jnp.asarray(solutions2train_h1norm, dt)
            inv_hc = jnp.asarray(1.0 / high_contrast_a, dt)
            a_flat = a2train.reshape(a2train.shape[0], -1).astype(dt)
            galerkin = self.greedy_for == GREEDY_FOR_GALERKIN
            for _ in range(n):
                V_pad, mask, selected, count = _greedy_step(
                    sm._ones_weights, sm._eye_weights, sm.load, a_flat,
                    solutions2train, h1, inv_hc, V_pad, mask, selected,
                    count, sm.grid_shape, galerkin,
                )
            selected_ix = np.asarray(selected)
        else:
            # generic (non-stencil) spaces: host-driven loop
            V_pad = jnp.zeros((n, dim), solutions2train.dtype)
            selected_list: list[int] = []

            iterator = range(n)
            if progress:
                try:
                    from tqdm import tqdm

                    iterator = tqdm(iterator, desc="Obtaining greedy basis.")
                except ImportError:
                    pass

            for k in iterator:
                V_act = V_pad[:k]
                if self.greedy_for == GREEDY_FOR_H10:
                    approx = sm.project(solutions2train, V_act)
                else:
                    approx = sm.forward_reduced(a2train, V_act)
                rel_err = (
                    sm.h10_norm(approx - solutions2train)
                    / solutions2train_h1norm
                )
                ix = int(jnp.argmax(rel_err))
                selected_list.append(ix)
                # contrast-sorted orthonormalisation for stability
                # (reference: ReducedBasis.py:134-136): stiff snapshots
                # enter the QR first; padded zero rows stay last
                order = np.argsort(1.0 / high_contrast_a[selected_list])
                snaps = solutions2train[
                    jnp.asarray(np.asarray(selected_list)[order])
                ]
                V_pad = orthonormalize_padded(snaps, n)
            selected_ix = np.asarray(selected_list)

        self.set(
            basis=solutions2train[jnp.asarray(selected_ix)],
            a=a2train[jnp.asarray(selected_ix)],
        )
        return self

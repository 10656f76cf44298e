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

import numpy as np
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
        # fixed-width padded basis: one compiled reduced-solve program for
        # every greedy iteration (the basis "grows" via the mask only)
        V_pad = jnp.zeros((n, dim), solutions2train.dtype)
        mask = np.zeros(n)
        selected_ix: list[int] = []

        iterator = range(n)
        if progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(iterator, desc="Obtaining greedy basis.")
            except ImportError:
                pass

        for k in iterator:
            if padded:
                if self.greedy_for == GREEDY_FOR_H10:
                    approx = sm.project_padded(solutions2train, V_pad, mask)
                else:
                    approx = sm.forward_reduced_padded(a2train, V_pad, mask)
            else:
                V_act = V_pad[:k]
                if self.greedy_for == GREEDY_FOR_H10:
                    approx = sm.project(solutions2train, V_act)
                else:
                    approx = sm.forward_reduced(a2train, V_act)
            rel_err = sm.h10_norm(approx - solutions2train) / solutions2train_h1norm
            ix = int(jnp.argmax(rel_err))
            selected_ix.append(ix)
            # contrast-sorted orthonormalisation for stability (reference:
            # ReducedBasis.py:134-136; see sort_orthogonalize_base for the
            # documented pairing deviation).  The active rows are kept sorted
            # by descending contrast so QR processes stiff snapshots first;
            # padded zero rows stay last and never affect the active part.
            order = np.argsort(1.0 / high_contrast_a[selected_ix])
            snaps = solutions2train[jnp.asarray(np.asarray(selected_ix)[order])]
            q = orthonormalize_padded(snaps, n)
            V_pad = q
            mask[: k + 1] = 1.0

        self.set(
            basis=solutions2train[jnp.asarray(selected_ix)],
            a=a2train[jnp.asarray(selected_ix)],
        )
        return self

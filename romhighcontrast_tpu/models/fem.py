"""P1 finite-element FOM space on a blocked uniform grid.

TPU-native rebuild of the reference's ``SolutionsManagerFEM``
(src/lib/SolutionsManagers.py:145-244) and the operator algebra of its base
class ``SolutionsManager`` (src/lib/SolutionsManagers.py:43-142):

* mesh: uniform right-triangle mesh (SW->NE split) over ``(nrb, ncb)`` blocks
  of ``N x N`` cells on ``[-ncb/2, ncb/2] x [-nrb/2, nrb/2]``;
  ``dim = (nrb*N - 1)(ncb*N - 1)`` interior vertices, flattened row-major
  (rows = y) exactly like the reference so coefficient vectors interoperate.
* operator: the 5-point stencil form (``ops.stencil``) — no dense
  ``(nrb, ncb, dim, dim)`` tensor is ever required (the reference's
  ``A_preassembled`` costs ~5 GB at the paper config; the stencil is O(dim)).
* solves: whole parameter batches as single tensor programs
  (``ops.solvers``), shardable over the device mesh (``parallel``).
"""

from __future__ import annotations

from functools import cached_property, partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.config import default_dtype
from romhighcontrast_tpu.ops import assembly, evaluation, solvers
from romhighcontrast_tpu.ops import stencil as st


def _canonical_batch(B0: int, dim: int) -> int | None:
    """Padded batch size for the iterative solve family, or None to run
    the exact shape.

    Every distinct batch shape costs a fresh remote compile
    (~minutes/program on the axon service, uncached across processes)
    while padded rows cost only proportional device time — so batches are
    padded up a canonical ladder.  HBM bounds it: the solve holds ~30
    batch x grid state arrays live (f32 CG state + f64 refinement +
    weight planes), so padded batch elements are capped at ~3.2e7 (B=2 at
    dim 1e6 measured fine; the old ladder's B=64 there crashed the TPU
    worker — 6.7e7 elements x ~30 arrays overruns the 16 GB chip).  At or
    past the cap, padding only burns memory the batch already strains —
    the exact shape runs instead (huge-dim work is compile-dominated
    anyway)."""
    cap = max(1, int(3.2e7) // (dim + 1))
    canon = None
    if B0 < cap:
        for c in (64, 128, 256, 512, 1000, 2048, 4096):
            if B0 <= c <= cap:
                canon = c
                break
        else:
            # above the ladder: next 1024-multiple; huge dim (cap below
            # the ladder): next power of two — both capped, both still
            # canonical across call sites
            canon = ((-(-B0 // 1024) * 1024) if B0 > 4096
                     else 1 << max(0, B0 - 1).bit_length())
            canon = min(canon, cap)
    return None if canon is None or canon <= B0 else canon


@partial(jax.jit, static_argnames=("N", "grid_shape", "tol", "inner",
                                   "inner_tol", "inner_opts"))
def _solve_mixed_from_a(a, rhs, N, grid_shape, tol, inner, inner_tol=None,
                        inner_opts=()):
    """One fused program for the fast solve path: coefficient expansion,
    stencil-weight construction, and the mixed-precision solve.  Keeping the
    whole pipeline under a single jit matters on remote-dispatch backends:
    eagerly dispatched weight-building ops cost milliseconds of latency each
    (measured ~20% of bench wall-clock).

    rhs: either the shared load vector ``(dim,)`` or per-sample right-hand
    sides ``batch + (dim,)``."""
    if inner == "pallas_2l" and min(grid_shape) >= 5:
        # hot path: the phased driver builds everything from the block
        # coefficients (a_blocks) — passing w=None keeps the f64 weight
        # build and symmetrize OUT of the traced graph entirely instead of
        # relying on XLA dead-code elimination, which is shape-dependent
        # (measured 2026-08-19: a 250-sample compile kept ~21 ms/batch of
        # dead weight work that the 1000-sample compile eliminated)
        w = None
    elif a.dtype == jnp.float64:
        # f32-expansion + two-sum build: ~8 ms/1000 samples cheaper than
        # the naive emulated-f64 path (see stencil.stencil_weights_split)
        w = st.stencil_weights_split(a, N)
    else:
        w = st.stencil_weights(st.cell_grid(a, N))
    batch = a.shape[:-2]
    if rhs.ndim == 1:
        rhs_grid = jnp.broadcast_to(
            rhs.reshape((1,) * len(batch) + grid_shape), batch + grid_shape
        )
    else:
        rhs_grid = rhs.reshape(batch + grid_shape)
    return solvers.solve_pcg_mixed(w, rhs_grid, tol=tol, inner=inner,
                                   inner_tol=inner_tol,
                                   inner_opts=inner_opts,
                                   a_blocks=a, block_N=N)


@partial(jax.jit, static_argnames=("grid_shape",))
def _reduced_family_padded(wq, V_pad, grid_shape):
    """F[q] = V K_q V^T for a zero-padded basis; one compiled program for all
    active sizes (inactive rows produce zero blocks)."""
    Vg = V_pad.reshape((-1,) + grid_shape)
    KqV = st.apply_operator(
        st.StencilCoefficients(*(x[:, None, :, :] for x in wq)), Vg
    )
    return jnp.einsum("ki,qli->qkl", V_pad, KqV.reshape(KqV.shape[:2] + (-1,)))


@partial(jax.jit, static_argnames=("grid_shape",))
def _forward_reduced_padded(wq, V_pad, load, a_flat, mask, grid_shape):
    """Reduced Galerkin solve with a fixed-width padded basis.

    mask (n_max,): 1.0 for active rows.  Inactive rows/cols of the reduced
    operator are replaced by the identity and their rhs by zero, so their
    coefficients are exactly zero — shape-stable across greedy iterations
    (no retracing as the basis grows).
    """
    F = _reduced_family_padded(wq, V_pad, grid_shape)
    A = jnp.einsum("bq,qkl->bkl", a_flat, F)
    act = mask[:, None] * mask[None, :]
    eye = jnp.eye(mask.shape[0], dtype=V_pad.dtype)
    A = A * act + eye * (1.0 - act)
    B = (V_pad @ load) * mask
    c = solvers.solve_small_spd(A, B)
    return (c * mask) @ V_pad


@partial(jax.jit, static_argnames=("grid_shape",))
def _project_padded(w1, V_pad, u, mask, grid_shape):
    """H10 projection with a fixed-width padded basis (same masking trick)."""
    KV = st.apply_operator_flat(w1, V_pad, grid_shape)
    G = V_pad @ KV.T
    act = mask[:, None] * mask[None, :]
    eye = jnp.eye(mask.shape[0], dtype=V_pad.dtype)
    G = G * act + eye * (1.0 - act)
    B = (u @ KV.T) * mask
    c = solvers.solve_spd_shared(G, B)
    return (c * mask) @ V_pad


class FemSpace:
    """The P1 FEM full-order space and its batched operator algebra.

    All batched APIs take coefficient fields ``a`` of shape
    ``(batch..., nrb, ncb)`` and solution coefficient arrays of shape
    ``(batch..., dim)``.
    """

    def __init__(self, blocks_geometry: tuple[int, int], N: int, method: str = "mixed"):
        self.blocks_geometry = tuple(blocks_geometry)
        nrb, ncb = self.blocks_geometry
        self.N = int(N)
        self.method = method
        self.x_domain = (-ncb / 2.0, ncb / 2.0)
        self.y_domain = (-nrb / 2.0, nrb / 2.0)
        self.nc_inner_vertices = ncb * N - 1
        self.nr_inner_vertices = nrb * N - 1
        self.grid_shape = (self.nr_inner_vertices, self.nc_inner_vertices)
        self.vspace_dim = self.nr_inner_vertices * self.nc_inner_vertices
        self.nc_cells = ncb * N + 1  # number of vertices along x (ref naming)
        self.nr_cells = nrb * N + 1
        self.points_c = np.linspace(*self.x_domain, self.nc_cells)
        self.points_r = np.linspace(*self.y_domain, self.nr_cells)
        self.dtype = default_dtype()
        #: load vector for f = 1 (dim,)
        self.load = assembly.load_vector(nrb, ncb, N, dtype=self.dtype)

    # ------------------------------------------------------------------ #
    # operator construction
    # ------------------------------------------------------------------ #
    def weights(self, a: jnp.ndarray) -> st.StencilCoefficients:
        """Stencil weights of ``K(a)`` for block coefficients ``(..., nrb, ncb)``."""
        return st.stencil_weights(st.cell_grid(jnp.asarray(a, self.dtype), self.N))

    def apply(self, a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """``K(a) x`` for flattened vectors ``(..., dim)`` (broadcasting batch)."""
        return st.apply_operator_flat(self.weights(a), jnp.asarray(x, self.dtype),
                                      self.grid_shape)

    @cached_property
    def _ones_weights(self) -> st.StencilCoefficients:
        return self.weights(jnp.ones(self.blocks_geometry, self.dtype))

    def apply_laplacian(self, x: jnp.ndarray) -> jnp.ndarray:
        """``K(1) x`` — the H10 inner-product operator."""
        return st.apply_operator_flat(self._ones_weights, jnp.asarray(x, self.dtype),
                                      self.grid_shape)

    def dense_operator(self, a: jnp.ndarray) -> jnp.ndarray:
        """Dense ``K(a)`` of shape ``(..., dim, dim)`` (small dims / parity)."""
        return assembly.dense_operator(self.weights(a))

    def dense_family(self) -> jnp.ndarray:
        """Dense affine family ``(nrb*ncb, dim, dim)``; reference
        ``A_preassembled`` (SolutionsManagers.py:217-218) reshaped to one
        block axis."""
        nrb, ncb = self.blocks_geometry
        return assembly.dense_affine_family(nrb, ncb, self.N, dtype=self.dtype)

    def block_indicators(self, blocks: Sequence[tuple[int, int]] | None = None
                         ) -> jnp.ndarray:
        """Coarse basis for the two-level preconditioner: indicator vectors of
        the strict interior vertices of each block, shape ``(k, nri, nci)``.

        These span the near-kernel of the Jacobi-scaled operator as the
        block coefficients go to infinity (the "limit solutions" directions).
        """
        nrb, ncb = self.blocks_geometry
        if blocks is None:
            blocks = [(i, j) for i in range(nrb) for j in range(ncb)]
        nri, nci = self.grid_shape
        out = np.zeros((len(blocks), nri, nci))
        for k, (bi, bj) in enumerate(blocks):
            # full-grid vertex rows strictly inside the block: bi*N+1 .. (bi+1)*N-1
            r0, r1 = bi * self.N + 1, (bi + 1) * self.N - 1
            c0, c1 = bj * self.N + 1, (bj + 1) * self.N - 1
            # interior-grid offset: -1
            out[k, r0 - 1 : r1, c0 - 1 : c1] = 1.0
        return jnp.asarray(out, self.dtype)

    # ------------------------------------------------------------------ #
    # FOM solves (snapshot generation)
    # ------------------------------------------------------------------ #
    def solve(
        self,
        a: jnp.ndarray,
        rhs: jnp.ndarray | None = None,
        method: str | None = None,
        tol: float = 1e-11,
        maxiter: int = 5_000,
        use_coarse: bool = False,
        chunk_size: int | None = None,
        interior_clusters: bool | None = None,
        return_info: bool = False,
        inner_tol: float | None = None,
        inner_opts: tuple = (),
        cluster_method: str | None = None,
    ) -> jnp.ndarray:
        """Batched FOM solve ``K(a) u = rhs`` (default rhs: the f=1 load).

        Replaces the reference's per-parameter (process-)mapped ``galerkin``
        solve (SolutionsManagers.py:17-40,64-68).  ``method``:

        * ``"mixed"`` (default) — f32 CG on the Jacobi-symmetrized system
          inside f64 iterative refinement; f64-accurate at any contrast.
        * ``"pallas"`` — same, with the fused multi-sample VMEM-resident
          Pallas inner CG with the two-level (Chebyshev + warped-coarse)
          preconditioner (fastest on TPU; interpret mode on CPU); blocks of
          samples are difficulty-sorted between refinement rounds.  Scale
          routing is automatic (r5): the phased dd-state driver serves up
          to ~(895, 895) vertices (mesh 192 on (4,4) blocks, dim 588k);
          up to (1023, 1023) (dim 1.05M) the solve stays IN-KERNEL
          through the generic refinement loop with serial grid-(1,)
          kernel launches; past that it falls back to the XLA inner.
        * ``"pallas_v2"`` — the single-level deg-12 Chebyshev fused kernel.
        * ``"pallas_v1"`` — the legacy one-sample-per-grid-step fused kernel.
        * ``"pcg"`` — pure-f64 Jacobi PCG (alias ``"lsqsparse"``).
        * ``"cholesky"`` — batched dense Cholesky (alias ``"lsq"``).

        ``cluster_method`` routes the interior-stiff-cluster bucket:
        ``"host"`` (default on f64-emulating backends) solves those samples
        with real-f64 scipy sparse LU on the host — the reference's own
        accuracy class (max ~1e-3 = eps64*kappa on corner samples, median
        ~3e-13; ops/host_lu.py has the round-4 measurements) — overlapped
        with the device fast path; ``"device"`` keeps the f64-emulated BNN-
        deflated device solver (jit-compatible, TRUE-residual floor ~1e-2 on
        the worst corner samples).
        """
        method = (method or self.method).lower()
        # Canonical batch sizes for the iterative family: every distinct
        # batch shape costs a fresh remote compile (~minutes/program on the
        # axon service, uncached across processes) while padded rows cost
        # only proportional device time.  Pad with a=1 samples (never adds
        # interior clusters) and strip afterwards.  1000 sits in the ladder
        # because it is the paper study / bench batch.
        a = jnp.asarray(a, self.dtype)
        _canon = None
        # gate on a non-CPU backend: the ladder amortizes the remote
        # service's per-shape compiles, which CPU/interpret runs don't pay —
        # there the padded rows would be pure waste (up to 64x for tests)
        if (method not in ("cholesky", "lsq") and a.ndim == 3
                and jax.default_backend() != "cpu"):
            _canon = _canonical_batch(a.shape[0], self.vspace_dim)
            if _canon is not None and rhs is not None and jnp.ndim(rhs) > 1:
                rhs = jnp.concatenate(
                    [jnp.asarray(rhs, self.dtype),
                     jnp.zeros((_canon - a.shape[0],) + jnp.shape(rhs)[1:],
                               self.dtype)], axis=0)
        if _canon is not None:
            if interior_clusters is None:
                # Inspect the ORIGINAL array: jax caches the host copy on
                # the array object, so repeated solves of the same batch pay
                # the device->host readback once.  The padded array below is
                # rebuilt per call — running the cluster check on IT forces
                # a fresh ~25-30 ms synchronous readback per solve (the
                # measured 4-14x small-batch cliff, scripts/
                # probe_batch_cliff.py; pad samples are a=1 and never add
                # interior clusters).
                from romhighcontrast_tpu.ops import clusters as cl

                try:
                    interior_clusters = bool(
                        cl.has_interior_cluster(np.asarray(a)).any()
                    )
                except Exception:
                    interior_clusters = None  # traced: inner call handles it
            B0 = a.shape[0]
            a = jnp.concatenate(
                [jnp.asarray(a, self.dtype),
                 jnp.ones((_canon - a.shape[0],) + a.shape[1:], self.dtype)],
                axis=0)
            out = self.solve(
                a, rhs=rhs, method=method, tol=tol, maxiter=maxiter,
                use_coarse=use_coarse, chunk_size=chunk_size,
                interior_clusters=interior_clusters, return_info=return_info,
                inner_tol=inner_tol, inner_opts=inner_opts,
                cluster_method=cluster_method,
            )
            if return_info:
                out, info = out
                info = solvers.PCGInfo(
                    iterations=info.iterations[:B0],
                    relative_residual=info.relative_residual[:B0],
                )
                return out[:B0], info
            return out[:B0]
        if self.N == 1 and method not in ("cholesky", "lsq"):
            # Degenerate discretisation: with one cell per block the stiff
            # blocks have no interior vertices and the Jacobi-symmetrized
            # operator keeps a contrast-dependent near-null cluster mode
            # (lambda_min ~ 1/contrast — measured), outside the iterative
            # solvers' design envelope.  These spaces are tiny; use the
            # exact dense path.
            method = "cholesky"
        a = jnp.asarray(a, self.dtype)
        squeeze = a.ndim == 2
        if squeeze:
            a = a[None]
        batch = a.shape[:-2]
        rhs_flat = self.load if rhs is None else jnp.asarray(rhs, self.dtype)

        if method in ("pcg", "lsqsparse", "cg", "pcg_mixed", "mixed", "pallas",
                      "pallas_v1", "pallas_v2"):
            if method in ("pcg_mixed", "mixed", "pallas", "pallas_v1",
                          "pallas_v2"):
                inner = {"pallas": "pallas_2l", "pallas_v2": "pallas_v2",
                         "pallas_v1": "pallas"}.get(method, "xla")
                # Interior stiff-block components carry 1/contrast near-null
                # modes unresolvable in f32 (measured: silent garbage without
                # treatment).  When present — or unknown because `a` is
                # traced — route to the deflated XLA inner solver with the
                # cluster coarse space; batches without interior clusters
                # take the fast path untouched.
                from romhighcontrast_tpu.ops import clusters as cl

                interior = interior_clusters
                if interior is None:
                    try:
                        interior = bool(
                            cl.has_interior_cluster(np.asarray(a)).any()
                        )
                    except Exception:
                        # traced coefficients: cannot inspect.  Default to the
                        # fast path — callers jitting solve() over parameter
                        # fields that may contain interior stiff clusters
                        # MUST pass interior_clusters=True.
                        import logging

                        logging.getLogger(__name__).warning(
                            "FemSpace.solve: coefficients are traced; assuming "
                            "no interior high-contrast clusters (pass "
                            "interior_clusters=True if they can occur)."
                        )
                        interior = False
                if not interior:
                    x, info = _solve_mixed_from_a(
                        a, rhs_flat, self.N, self.grid_shape, tol, inner,
                        inner_tol=inner_tol, inner_opts=inner_opts,
                    )
                else:
                    nrb, ncb = self.blocks_geometry
                    a2 = a.reshape((-1,) + a.shape[-2:])
                    lab_np = None
                    try:
                        # compact host labels: k_actual masked passes
                        # (typically 1-4) instead of the nrb*ncb bound
                        lab_np, kmax = cl.cluster_labels_host(
                            np.asarray(a2), self.N
                        )
                    except Exception:  # traced coefficients
                        pass
                    if lab_np is not None:
                        has = lab_np.reshape(lab_np.shape[0], -1).any(axis=1)
                        x, info = self._solve_split(
                            a2, rhs_flat, lab_np, kmax, has, tol, maxiter,
                            inner, cluster_method=cluster_method,
                        )
                        x = x.reshape(batch + self.grid_shape)
                        info = solvers.PCGInfo(
                            iterations=info.iterations.reshape(batch),
                            relative_residual=info.relative_residual
                            .reshape(batch),
                        )
                    else:
                        w = self.weights(a)
                        rhs_grid = jnp.broadcast_to(
                            rhs_flat.reshape(
                                (1,) * len(batch) + self.grid_shape
                            ),
                            batch + self.grid_shape,
                        )
                        labels = cl.cluster_labels(a2, self.N)
                        x, info = solvers.solve_pcg_deflated(
                            w, rhs_grid,
                            cluster_labels=labels.reshape(
                                batch + self.grid_shape
                            ),
                            n_clusters=nrb * ncb,
                            tol=tol, maxiter=maxiter,
                        )
            else:
                w = self.weights(a)
                rhs_grid = jnp.broadcast_to(
                    rhs_flat.reshape((1,) * len(batch) + self.grid_shape),
                    batch + self.grid_shape,
                )
                coarse = (
                    self.block_indicators() if use_coarse and self.N >= 2 else None
                )
                x, info = solvers.solve_pcg(
                    w, rhs_grid, tol=tol, maxiter=maxiter,
                    coarse_basis=coarse, use_coarse=coarse is not None,
                )
            out = x.reshape(batch + (self.vspace_dim,))
        elif method in ("cholesky", "lsq"):
            a2 = a.reshape((-1,) + a.shape[-2:])
            n = a2.shape[0]
            if chunk_size is None:
                # keep dense K chunks under ~2 GB
                per = self.vspace_dim * self.vspace_dim * jnp.dtype(self.dtype).itemsize
                chunk_size = max(1, min(n, int(2e9 // max(per, 1))))
            outs = []
            for i in range(0, n, chunk_size):
                Ka = assembly.dense_operator(self.weights(a2[i : i + chunk_size]))
                outs.append(solvers.solve_cholesky(Ka, rhs_flat))
            out = jnp.concatenate(outs, axis=0).reshape(batch + (self.vspace_dim,))
            if return_info:
                r = rhs_flat[None] - st.apply_operator_flat(
                    self.weights(a2), out.reshape(n, -1), self.grid_shape
                ).reshape(n, -1)
                rel = jnp.linalg.norm(r, axis=-1) / jnp.linalg.norm(rhs_flat)
                info = solvers.PCGInfo(iterations=jnp.zeros((n,), jnp.int32),
                                       relative_residual=rel)
        else:
            raise ValueError(f"Unknown solve method {method!r}")
        out = out[0] if squeeze else out
        if return_info:
            return out, info
        return out

    def _solve_split(self, a2, rhs_flat, lab_np, kmax, has, tol, maxiter,
                     inner, cluster_method=None):
        """Shape-stable fast/cluster batch split.

        Samples with interior stiff clusters take the cluster route —
        ``cluster_method="host"`` (default on f64-emulating backends): real-
        f64 LAPACK banded Cholesky on the host (host_lu.solve_banded_batch;
        the reference's own accuracy class, SolutionsManagers.py:29-31, and
        2.2x its sparse-LU cost on this host), overlapped with the
        asynchronous device fast path; ``"device"``: the f64-emulated
        BNN-deflated device solver (round-4 measured TRUE-residual floor
        ~1e-2 on corner samples — see ops/host_lu.py).  Everyone else takes
        the fused fast path.  Previously one cluster sample dragged the
        whole batch onto the slow path.

        Shape discipline (compiles cost ~40 s per fresh shape on the remote
        compiler — measured to drop a cluster-heavy study from 222 to 24
        solves/s before this design):

        * the FAST path runs on the FULL batch — the same canonical shape as
          cluster-free batches, compiled exactly once per batch size.
          Cluster samples produce garbage there (overwritten below); their
          wasted iterations are trivial because difficulty sorting packs
          them into few blocks and the divergence freeze halts them early;
        * the deflated bucket pads to multiples of 64 and its static
          cluster-count bound rounds up to a power of two;
        * cluster-DOMINATED batches (more cluster samples than clean ones)
          skip the split entirely: one whole-batch deflated shape, with the
          clean minority paying f64 pricing.
        """
        B = a2.shape[0]
        idx_f = np.where(~has)[0]
        idx_c = np.where(has)[0]
        rhs_b = None if rhs_flat.ndim == 1 else rhs_flat.reshape(B, -1)

        def pad_idx(idx, m):
            return np.concatenate([idx, np.repeat(idx[-1:], -len(idx) % m)])

        # static bound for the masked coarse passes, shape-bucketed
        kpow2 = 1 << (max(int(kmax), 1) - 1).bit_length()

        if cluster_method is None:
            cluster_method = ("host" if jax.default_backend() != "cpu"
                              else "device")

        if cluster_method == "host" and len(idx_c):
            from romhighcontrast_tpu.ops import host_lu

            # dispatch the (asynchronous) device fast path for the clean
            # majority FIRST, then factorize the cluster bucket on the host
            # while the device works
            x = jnp.zeros((B,) + self.grid_shape, self.dtype)
            res = jnp.zeros((B,), self.dtype)
            iters = jnp.zeros((B,), jnp.int32)
            if len(idx_f):
                xf, inf_f = _solve_mixed_from_a(
                    a2, rhs_flat, self.N, self.grid_shape, tol, inner
                )
            # gather on HOST: a device-side a2[idx_c] would enqueue behind
            # the fast-path solve just dispatched and block the host
            # factorization until it finishes, defeating the overlap.
            # (For non-padded batches a2's host copy is already cached by
            # jax from the cluster check; ladder-padded batches pay one
            # ~25 ms readback of the freshly-built padded array here —
            # reading an existing buffer, so the overlap still holds.)
            a_c = np.asarray(a2)[idx_c]
            rhs_c = (np.asarray(rhs_flat) if rhs_b is None
                     else np.asarray(rhs_b)[idx_c])
            xc_np, res_c = host_lu.solve_banded_batch(a_c, self.N, rhs_c)
            x = x.at[idx_c].set(
                jnp.asarray(xc_np.reshape((-1,) + self.grid_shape),
                            self.dtype))
            res = res.at[idx_c].set(jnp.asarray(res_c, self.dtype))
            if len(idx_f):
                x = x.at[idx_f].set(xf[idx_f])
                res = res.at[idx_f].set(inf_f.relative_residual[idx_f])
                iters = iters.at[idx_f].set(
                    inf_f.iterations[idx_f].astype(jnp.int32))
            return x, solvers.PCGInfo(iterations=iters,
                                      relative_residual=res)

        if len(idx_c) > len(idx_f):
            rhs_grid = jnp.broadcast_to(
                rhs_flat.reshape((1,) + self.grid_shape)
                if rhs_b is None
                else rhs_b.reshape((-1,) + self.grid_shape),
                (B,) + self.grid_shape,
            )
            x, info = solvers.solve_pcg_deflated(
                self.weights(a2), rhs_grid,
                cluster_labels=jnp.asarray(lab_np),
                n_clusters=kpow2, tol=tol, maxiter=maxiter,
            )
            return x, solvers.PCGInfo(
                iterations=info.iterations.astype(jnp.int32),
                relative_residual=info.relative_residual,
            )

        x = jnp.zeros((B,) + self.grid_shape, self.dtype)
        res = jnp.zeros((B,), self.dtype)
        iters = jnp.zeros((B,), jnp.int32)
        if len(idx_f):
            # full batch through the fast path: canonical shape, shared with
            # the cluster-free route; cluster rows are overwritten below
            xf, inf_f = _solve_mixed_from_a(
                a2, rhs_flat, self.N, self.grid_shape, tol, inner
            )
            x = x.at[idx_f].set(xf[idx_f])
            res = res.at[idx_f].set(inf_f.relative_residual[idx_f])
            iters = iters.at[idx_f].set(
                inf_f.iterations[idx_f].astype(jnp.int32)
            )
        if len(idx_c):
            # quantize the deflated bucket to a power-of-two ladder
            # (64, 128, 256, ...): the f64 while_loop costs ~35 s per fresh
            # shape on the remote compiler, so sizes must be canonical —
            # but per-iteration work scales with the padded width, and a
            # typical study batch has only the contrast-corner samples in
            # this bucket (measured: 33 of 256 -> padding to 256 made the
            # dominant stage 4x slower than needed)
            m = 64
            while m < len(idx_c):
                m *= 2
            pc = pad_idx(idx_c, min(m, B))
            rc = rhs_flat if rhs_b is None else rhs_b[pc]
            rhs_grid = jnp.broadcast_to(
                rc.reshape((1,) + self.grid_shape)
                if rhs_b is None else rc.reshape((-1,) + self.grid_shape),
                (len(pc),) + self.grid_shape,
            )
            xc, inf_c = solvers.solve_pcg_deflated(
                self.weights(a2[pc]), rhs_grid,
                cluster_labels=jnp.asarray(lab_np[pc]),
                n_clusters=kpow2,
                tol=tol, maxiter=maxiter,
            )
            nc = len(idx_c)
            x = x.at[idx_c].set(xc[:nc])
            res = res.at[idx_c].set(inf_c.relative_residual[:nc])
            iters = iters.at[idx_c].set(
                inf_c.iterations[:nc].astype(jnp.int32)
            )
        return x, solvers.PCGInfo(iterations=iters, relative_residual=res)

    def generate_solutions(self, a2try: jnp.ndarray, **kw) -> jnp.ndarray:
        """Reference-named alias of :meth:`solve` (SolutionsManagers.py:64-68)."""
        return self.solve(a2try, **kw)

    def solve_bootstrapped(
        self,
        a: jnp.ndarray,
        n_seed: int = 24,
        n_modes: int = 12,
        method: str | None = None,
        tol: float = 1e-11,
        return_info: bool = False,
    ) -> jnp.ndarray:
        """Two-phase batched solve: use the ROM to accelerate the FOM.

        Solve a small seed subset cold, build a POD basis from it, and
        warm-start the full batch from the reduced Galerkin prediction —
        the solution manifold is low-dimensional (that is the premise of the
        whole framework), so the prediction captures most of every solution
        and the iterative solve only refines the small remainder.

        The warm-started solve runs through the same phased driver as the
        cold path (including its single-level mop-up phases — the two-level
        kernel alone floors at ~3e-9 true residual at fine meshes).  Pass
        ``return_info=True`` to get the PCGInfo (per-sample residuals) of
        the warm-started phase.
        """
        method = (method or self.method).lower()
        a = jnp.asarray(a, self.dtype)
        if a.ndim == 2:
            return self.solve(a, method=method, tol=tol,
                              return_info=return_info)
        a2 = a.reshape((-1,) + a.shape[-2:])
        n_seed = min(n_seed, a2.shape[0])
        seed_sols = self.solve(a2[:n_seed], method=method, tol=tol)
        # uncentered POD: the warm start must live in a linear subspace
        _, S, Vt = jnp.linalg.svd(seed_sols, full_matrices=False)
        V = Vt[: min(n_modes, n_seed)]
        x0 = self.forward_reduced(a2, V)  # (b, dim) reduced Galerkin
        w = self.weights(a2)
        rhs_grid = jnp.broadcast_to(
            self.load.reshape((1,) + self.grid_shape),
            (a2.shape[0],) + self.grid_shape,
        )
        inner = {"pallas": "pallas_2l", "pallas_v2": "pallas_v2",
                 "pallas_v1": "pallas"}.get(method, "xla")
        x, info = solvers.solve_pcg_mixed(
            w, rhs_grid, tol=tol, inner=inner,
            x0=x0.reshape((-1,) + self.grid_shape),
        )
        out = x.reshape(a.shape[:-2] + (self.vspace_dim,))
        if return_info:
            info = solvers.PCGInfo(
                iterations=info.iterations.reshape(a.shape[:-2]),
                relative_residual=info.relative_residual
                .reshape(a.shape[:-2]),
            )
            return out, info
        return out

    # ------------------------------------------------------------------ #
    # norms
    # ------------------------------------------------------------------ #
    def h10_norm(self, solutions: jnp.ndarray) -> jnp.ndarray:
        """H10 seminorm ``sqrt(u^T K(1) u)`` (reference: H10norm,
        SolutionsManagers.py:56-58)."""
        u = jnp.asarray(solutions, self.dtype)
        return jnp.sqrt(jnp.maximum(jnp.sum(u * self.apply_laplacian(u), axis=-1), 0.0))

    @staticmethod
    def l2_norm(solutions: jnp.ndarray) -> jnp.ndarray:
        """Coefficient l2 norm (reference: l2norm, SolutionsManagers.py:60-62)."""
        u = jnp.asarray(solutions)
        return jnp.sqrt(jnp.sum(u * u, axis=-1))

    # reference-style aliases
    H10norm = h10_norm
    l2norm = l2_norm

    # ------------------------------------------------------------------ #
    # point evaluation / measurements
    # ------------------------------------------------------------------ #
    def evaluation_matrix(self, points: jnp.ndarray) -> jnp.ndarray:
        """``E (m, dim)`` with ``evaluate(points, u) = u @ E.T``."""
        return evaluation.evaluation_matrix(points, self.points_c, self.points_r,
                                            dtype=self.dtype)

    def evaluate_solutions(self, points: jnp.ndarray, solutions: jnp.ndarray
                           ) -> jnp.ndarray:
        """Evaluate solutions at points; returns ``(n_solutions, m)``
        (reference: SolutionsManagers.py:221-244, rebuilt as one matmul)."""
        E = self.evaluation_matrix(points)
        return jnp.asarray(solutions, self.dtype) @ E.T

    def generate_riesz(self, x: jnp.ndarray, norm: str = "h10") -> jnp.ndarray:
        """Riesz representers of point evaluations, shape ``(m, dim)``.

        Only the l2 (coefficient) inner product is well-posed — point
        evaluations are not H^-1 functionals for P1, mirroring the
        reference's explicit refusal (SolutionsManagers.py:78-84).
        """
        if norm == "l2":
            return self.evaluation_matrix(jnp.asarray(x))
        raise NotImplementedError(
            "Point evaluations are not bounded H10 functionals; a mollified "
            "observation kernel would be required (reference raises too: "
            "SolutionsManagers.py:79)."
        )

    # ------------------------------------------------------------------ #
    # reduced-operator algebra (online problems)
    # ------------------------------------------------------------------ #
    def reduced_family(self, V: jnp.ndarray) -> jnp.ndarray:
        """``F[q] = V K_q V^T`` of shape ``(Q, n, n)`` via stencil applies of
        the block indicator coefficients — never a dense K_q
        (reference computes this from the dense preassembled tensor:
        SolutionsManagers.py:93-101)."""
        nrb, ncb = self.blocks_geometry
        V = jnp.asarray(V, self.dtype)
        eye = jnp.eye(nrb * ncb, dtype=self.dtype).reshape(nrb * ncb, nrb, ncb)
        wq = self.weights(eye)  # (Q, nr, nc) weights
        Vg = V.reshape((-1,) + self.grid_shape)  # (n, nri, nci)
        KqV = st.apply_operator(
            st.StencilCoefficients(*(x[:, None, :, :] for x in wq)), Vg
        )  # (Q, n, nri, nci)
        return jnp.einsum("ki,qli->qkl", V, KqV.reshape(KqV.shape[:2] + (-1,)))

    def reduced_rhs(self, V: jnp.ndarray) -> jnp.ndarray:
        """``B_k = V b`` (reference: SolutionsManagers.py:103)."""
        return jnp.asarray(V, self.dtype) @ self.load

    def forward_reduced(self, a: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
        """Online reduced Galerkin solve lifted to FOM coefficients
        (reference: generate_fm_solutions, SolutionsManagers.py:88-106).

        a: ``(b, nrb, ncb)``; V: ``(n, dim)``.  Returns ``(b, dim)``.
        """
        a = jnp.asarray(a, self.dtype)
        if a.ndim == 2:
            a = a[None]
        V = jnp.asarray(V, self.dtype)
        if V.shape[0] == 0:
            return jnp.zeros((a.shape[0], self.vspace_dim), self.dtype)
        F = self.reduced_family(V)  # (Q, n, n)
        A = jnp.einsum("bq,qkl->bkl", a.reshape(a.shape[0], -1), F)
        c = solvers.solve_small_spd(A, self.reduced_rhs(V))
        return c @ V

    def project(self, solutions: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
        """H10-orthogonal projection onto span(V), lifted
        (reference: project_solutions, SolutionsManagers.py:108-139 — its
        per-block einsums telescope to ``K(1)``)."""
        u = jnp.atleast_2d(jnp.asarray(solutions, self.dtype))
        V = jnp.asarray(V, self.dtype)
        if V.shape[0] == 0:
            return jnp.zeros((u.shape[0], self.vspace_dim), self.dtype)
        KV = self.apply_laplacian(V)  # (n, dim)
        G = V @ KV.T  # (n, n) H10 Gram
        B = u @ KV.T  # (b, n)
        c = solvers.solve_spd_shared(G, B)
        return c @ V

    # reference-style aliases
    generate_fm_solutions = forward_reduced
    project_solutions = project

    # shape-stable padded variants (used by the greedy loop so the basis can
    # grow without retracing; see _forward_reduced_padded)
    @cached_property
    def _eye_weights(self) -> st.StencilCoefficients:
        nrb, ncb = self.blocks_geometry
        eye = jnp.eye(nrb * ncb, dtype=self.dtype).reshape(nrb * ncb, nrb, ncb)
        return self.weights(eye)

    def forward_reduced_padded(self, a, V_pad, mask):
        a = jnp.asarray(a, self.dtype)
        return _forward_reduced_padded(
            self._eye_weights, jnp.asarray(V_pad, self.dtype), self.load,
            a.reshape(a.shape[0], -1), jnp.asarray(mask, self.dtype),
            self.grid_shape,
        )

    def project_padded(self, u, V_pad, mask):
        return _project_padded(
            self._ones_weights, jnp.asarray(V_pad, self.dtype),
            jnp.asarray(u, self.dtype), jnp.asarray(mask, self.dtype),
            self.grid_shape,
        )

    def __str__(self) -> str:  # parity with reference __str__ naming
        return self.__class__.__name__

"""Staged experiment pipeline with cartesian variant expansion and caching.

TPU-native counterpart of the PerplexityLab ``LabPipeline`` orchestration the
reference leans on (NonLinearROM.py:142-165, InverseProblemPipeline.ipynb
cell 65): stages are named blocks of functions; the pipeline runs the
cartesian product of per-stage variants and keyword-parameter grids, feeding
each function from the accumulated context, and caches stage outputs in an
:class:`ExperimentStore` keyed by the variant/parameter path.

Design deltas from the reference's dependency:
  * no process pools — each stage body is expected to issue batched device
    work (the parallelism is inside the tensor programs, and across the
    device mesh via ``parallel``);
  * caching is per (stage, variant, params) with idempotent re-entry,
    replacing the DataManager/JOBLIB layer.
"""

from __future__ import annotations

import hashlib
import inspect
import itertools
import json
from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np


@dataclass
class FunctionBlock:
    """A named stage variant (reference: PerplexityLab FunctionBlock)."""

    name: str
    fn: Callable

    def __call__(self, **kwargs):
        return self.fn(**kwargs)


def _needed_kwargs(fn: Callable, ctx: dict) -> dict:
    params = inspect.signature(fn).parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return dict(ctx)
    return {k: ctx[k] for k in params if k in ctx}


def _key(parts) -> str:
    raw = json.dumps(parts, sort_keys=True, default=str)
    return hashlib.sha1(raw.encode()).hexdigest()[:16]


@dataclass
class LabPipeline:
    """Cartesian staged pipeline.

    Usage::

        pipe = LabPipeline()
        pipe.define_new_block_of_functions("sample", sample_fn)
        pipe.define_new_block_of_functions(
            "basis", FunctionBlock("PCA", pca_fn), FunctionBlock("Greedy", g_fn))
        results = pipe.execute(store=None, n=[100], m=[10, 20])

    Each stage function receives (by name) any value produced by earlier
    stages plus the grid parameters, and returns a dict merged into the
    context.  ``execute`` returns one context dict per (variant x params)
    combination, each tagged with the chosen variant names.
    """

    stages: list[tuple[str, list[FunctionBlock]]] = field(default_factory=list)

    def define_new_block_of_functions(self, name: str, *fns) -> None:
        blocks = [
            f if isinstance(f, FunctionBlock) else FunctionBlock(
                getattr(f, "__name__", name), f
            )
            for f in fns
        ]
        self.stages.append((name, blocks))

    def execute(self, store=None, verbose: bool = False, **param_grid
                ) -> list[dict]:
        for k, v in param_grid.items():
            if not isinstance(v, (list, tuple)):
                raise TypeError(f"parameter {k!r} must be a list of variants")
        param_names = list(param_grid)
        param_combos = list(itertools.product(*param_grid.values())) or [()]
        variant_combos = list(
            itertools.product(*[blocks for _, blocks in self.stages])
        )
        results = []
        for params in param_combos:
            base_ctx = dict(zip(param_names, params))
            for variants in variant_combos:
                ctx = dict(base_ctx)
                tags = {}
                for (stage_name, _), block in zip(self.stages, variants):
                    tags[stage_name] = block.name
                    cache_key = None
                    if store is not None:
                        cache_key = _key(
                            [stage_name, block.name, sorted(tags.items()),
                             sorted(base_ctx.items())]
                        )
                        cached = store.get("pipeline", {}).get(cache_key)
                        if cached is not None:
                            ctx.update(cached)
                            continue
                    out = block(**_needed_kwargs(block.fn, ctx))
                    if out is None:
                        out = {}
                    if not isinstance(out, dict):
                        raise TypeError(
                            f"stage {stage_name}/{block.name} must return a dict"
                        )
                    ctx.update(out)
                    if store is not None:
                        serialisable = all(
                            isinstance(v, (int, float, str, np.ndarray))
                            or hasattr(v, "__array__")
                            for v in out.values()
                        )
                        # cache ONLY fully-serialisable stage outputs: a
                        # partial cache hit would silently drop object
                        # outputs (e.g. a solution manager) on re-entry and
                        # starve downstream stages
                        if serialisable:
                            store.setdefault("pipeline", {})[cache_key] = {
                                k: np.asarray(v) if hasattr(v, "__array__") else v
                                for k, v in out.items()
                            }
                            store.save()
                    if verbose:
                        print(f"[{tags}] {stage_name} done")
                ctx["__variants__"] = tags
                results.append(ctx)
        return results

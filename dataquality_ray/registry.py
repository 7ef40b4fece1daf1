"""Pipeline-step registry — the engine's user-extension surface
(SURVEY §2.10: each step is a (name, fn | ActorClass, kwargs) applied as
map_batches; thresholds live in the PipelineConfig dataclass; scorers are
duck-typed batch → batch callables).

Reference analog: the reference's extension points are per-request model
selection and prompt hooks threaded through its stack (schemas.py:11,
bedrock.py:95-108); ours is declarative — register a step once, compose
pipelines by name:

    from dataquality_ray.registry import register_step, apply_steps

    @register_step("my_filter", batch_format="pyarrow")
    def my_filter(batch: pa.Table, cfg=None) -> pa.Table: ...

    ds = apply_steps(ds, ["scrub", "heuristics", "my_filter"], cfg)

A step callable may be a plain function (stateless tasks) or a class
(actor pool — pass ``concurrency`` in the step kwargs).
"""

from __future__ import annotations

import functools
import inspect
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig


@dataclass(frozen=True)
class Step:
    name: str
    fn: Any                       # callable(batch, ...) or actor class
    map_kwargs: Dict[str, Any] = field(default_factory=dict)
    pass_cfg: bool = True         # inject cfg= into the callable


_REGISTRY: Dict[str, Step] = {}


def register_step(name: str, fn: Optional[Callable] = None,
                  pass_cfg: bool = True, **map_kwargs):
    """Register a step; usable as a decorator or a direct call."""
    def _register(f):
        _REGISTRY[name] = Step(name, f, dict(map_kwargs), pass_cfg)
        return f
    if fn is not None:
        return _register(fn)
    return _register


def get_step(name: str) -> Step:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown step {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_steps() -> List[str]:
    return sorted(_REGISTRY)


def apply_steps(ds, names: List[str],
                cfg: PipelineConfig = DEFAULT_CONFIG):
    """Compose registered steps onto a Dataset, in order."""
    for name in names:
        step = get_step(name)
        kwargs = dict(step.map_kwargs)
        kwargs.setdefault("batch_format", "pyarrow")
        if inspect.isclass(step.fn):
            ctor = dict(kwargs.pop("fn_constructor_kwargs", {}))
            if step.pass_cfg:
                ctor.setdefault("cfg", cfg)
            kwargs.setdefault("concurrency", (1, cfg.actor_pool_size))
            kwargs.setdefault("batch_size", cfg.batch_size)
            ds = ds.map_batches(step.fn, fn_constructor_kwargs=ctor,
                                **kwargs)
        else:
            fn = step.fn
            if step.pass_cfg:
                fn = functools.partial(fn, cfg=cfg)
            ds = ds.map_batches(fn, **kwargs)
    return ds


# ---------------------------------------------------------------------------
# built-in steps
# ---------------------------------------------------------------------------

def _register_builtins() -> None:
    from dataquality_ray.stages.decision import decision_batch
    from dataquality_ray.stages.dedup import (
        MinHashSimHash,
        content_hash_batch,
    )
    from dataquality_ray.stages.heuristics import heuristics_batch
    from dataquality_ray.stages.model_scorers import CombinedModelScorer
    from dataquality_ray.stages.scrub import scrub_batch

    register_step("scrub", scrub_batch, pass_cfg=False,
                  zero_copy_batch=True)
    register_step("heuristics", heuristics_batch, zero_copy_batch=True)
    register_step("models", CombinedModelScorer)
    register_step("decision", decision_batch, zero_copy_batch=True)
    register_step("content_hash", content_hash_batch, pass_cfg=False,
                  zero_copy_batch=True)
    register_step("sketches", MinHashSimHash)


_register_builtins()

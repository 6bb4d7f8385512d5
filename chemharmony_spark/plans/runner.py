"""Pipeline runner replacing the reference's DVC DAG (SURVEY.md §3.1).

The reference orchestrates 15 integration stages -> harmonize -> enrichment
as separate OS processes exchanging parquet (dvc.yaml:1-154). In the engine,
stages are plain functions sharing one SparkSession, ordered by declared
dependencies; materialization between stages is explicit parquet (the same
checkpointing the reference relies on, 80_harmonize.py:42-43).

Content-hash change detection (dvc.lock) is optional at this layer: stage
outputs are deterministic functions of inputs (md5 identity everywhere), so
re-running a stage is idempotent by construction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any


@dataclass
class Stage:
    name: str
    fn: Callable[..., Any]
    deps: list[str] = field(default_factory=list)


class Pipeline:
    def __init__(self) -> None:
        self._stages: dict[str, Stage] = {}

    def stage(self, name: str, deps: list[str] | None = None):
        """Decorator: register a stage. The function receives the results of
        its dependencies as keyword arguments (by stage name)."""

        def wrap(fn):
            self._stages[name] = Stage(name, fn, deps or [])
            return fn

        return wrap

    def run(self, only: list[str] | None = None) -> dict[str, Any]:
        graph = {s.name: set(s.deps) for s in self._stages.values()}
        order = list(TopologicalSorter(graph).static_order())
        if only:
            wanted: set[str] = set()

            def expand(n: str) -> None:
                if n in wanted:
                    return
                wanted.add(n)
                for d in self._stages[n].deps:
                    expand(d)

            for n in only:
                expand(n)
            order = [n for n in order if n in wanted]
        results: dict[str, Any] = {}
        for name in order:
            st = self._stages[name]
            kwargs = {d: results[d] for d in st.deps}
            results[name] = st.fn(**kwargs)
        return results

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

import hashlib
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any


@dataclass
class Stage:
    name: str
    fn: Callable[..., Any]
    deps: list[str] = field(default_factory=list)
    inputs: list[str] = field(default_factory=list)   # paths (content-hash key)
    outputs: list[str] = field(default_factory=list)  # paths that must exist


def _fingerprint_paths(paths: list[str]) -> str:
    """Cheap content fingerprint of input paths: file names + sizes + mtimes,
    recursive for directories (the same change-detection granularity dvc.lock
    gives the reference without re-hashing terabytes)."""
    h = hashlib.md5()
    for root in sorted(paths):
        if os.path.isdir(root):
            for dirpath, dirnames, filenames in sorted(os.walk(root)):
                dirnames.sort()
                for fn in sorted(filenames):
                    p = os.path.join(dirpath, fn)
                    st = os.stat(p)
                    h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
        elif os.path.exists(root):
            st = os.stat(root)
            h.update(f"{root}|{st.st_size}|{st.st_mtime_ns}".encode())
        else:
            h.update(f"{root}|missing".encode())
    return h.hexdigest()


class Pipeline:
    """Dependency-ordered stage runner. With ``state_path`` set, stages that
    declare ``inputs``/``outputs`` are SKIPPED when their input fingerprint
    is unchanged and all outputs exist (dvc-style incremental repro); their
    result is then ``None`` and downstream stages re-read from ``outputs``.
    """

    def __init__(self, state_path: str | None = None) -> None:
        self._stages: dict[str, Stage] = {}
        self._state_path = state_path

    def stage(self, name: str, deps: list[str] | None = None,
              inputs: list[str] | None = None, outputs: list[str] | None = None):
        """Decorator: register a stage. The function receives the results of
        its dependencies as keyword arguments (by stage name)."""

        def wrap(fn):
            self._stages[name] = Stage(name, fn, deps or [], inputs or [],
                                       outputs or [])
            return fn

        return wrap

    def _load_state(self) -> dict:
        if self._state_path and os.path.exists(self._state_path):
            try:
                with open(self._state_path) as f:
                    return json.load(f)
            except (ValueError, OSError):
                return {}  # unreadable state: safe fallback is re-run everything
        return {}

    def _save_state(self, state: dict) -> None:
        if self._state_path:
            os.makedirs(os.path.dirname(self._state_path) or ".", exist_ok=True)
            with open(self._state_path, "w") as f:
                json.dump(state, f)

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
        state = self._load_state()
        results: dict[str, Any] = {}
        for name in order:
            st = self._stages[name]
            kwargs = {d: results[d] for d in st.deps}
            skippable = bool(self._state_path and st.inputs and st.outputs)
            if skippable:
                fp = _fingerprint_paths(st.inputs)
                outputs_ok = all(os.path.exists(p) for p in st.outputs)
                if state.get(name) == fp and outputs_ok:
                    results[name] = None  # unchanged: downstream re-reads outputs
                    continue
            results[name] = st.fn(**kwargs)
            if skippable:
                state[name] = _fingerprint_paths(st.inputs)
                self._save_state(state)
        return results

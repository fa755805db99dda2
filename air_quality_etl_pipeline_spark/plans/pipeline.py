"""Orchestration / control flow (SURVEY §2.10 C1-C6).

The reference's pipeline is a JSON DAG of activities with
``dependsOn: Succeeded`` edges, a sequential ForEach over a table list,
a per-activity retry policy, and runtime parameters computed from
expressions like ``addDays(utcNow(), -110)`` (reference: ``Automated
Pipeline.DataPipeline/pipeline-content.json:5-178``). None of that
needs an engine — it is plain Python composition around Spark actions.
The value added here is uniform retry/skip/failure semantics and a run
report, so a weekly incremental run is one call.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field


@dataclass
class Activity:
    """One DAG node (reference C1/C3): *fn* runs with the shared
    context dict; *depends_on* are activity names that must have
    SUCCEEDED first (dependsOn-Succeeded semantics); *retry* re-runs on
    failure (reference default 0)."""

    name: str
    fn: Callable[[dict], object]
    depends_on: Sequence[str] = ()
    retry: int = 0


@dataclass
class ActivityResult:
    status: str  # "succeeded" | "failed" | "skipped"
    output: object = None
    error: str | None = None
    attempts: int = 0
    seconds: float = 0.0


@dataclass
class PipelineRun:
    results: dict[str, ActivityResult] = field(default_factory=dict)

    @property
    def succeeded(self) -> bool:
        return all(r.status == "succeeded" for r in self.results.values())


def run_pipeline(
    activities: Sequence[Activity], context: dict | None = None
) -> PipelineRun:
    """C1: run the DAG in the given (already topologically valid)
    order. An activity whose dependency did not succeed is SKIPPED, not
    failed — downstream of a failure stays untouched, matching the
    reference pipeline's behavior on activity failure."""
    ctx = context or {}
    run = PipelineRun()
    for act in activities:
        unmet = [
            d
            for d in act.depends_on
            if run.results.get(d, ActivityResult("failed")).status != "succeeded"
        ]
        if unmet:
            run.results[act.name] = ActivityResult(
                "skipped", error=f"dependencies not succeeded: {unmet}"
            )
            continue
        attempts = 0
        t0 = time.perf_counter()
        while True:
            attempts += 1
            try:
                out = act.fn(ctx)
                run.results[act.name] = ActivityResult(
                    "succeeded",
                    output=out,
                    attempts=attempts,
                    seconds=round(time.perf_counter() - t0, 3),
                )
                ctx[act.name] = out
                break
            except Exception as exc:  # noqa: BLE001 — report, don't mask
                if attempts <= act.retry:
                    continue
                run.results[act.name] = ActivityResult(
                    "failed",
                    error=f"{type(exc).__name__}: {exc}",
                    attempts=attempts,
                    seconds=round(time.perf_counter() - t0, 3),
                )
                break
    return run


def foreach(
    items: Sequence, fn: Callable[[object], object]
) -> list:
    """C2: sequential ForEach (the reference iterates its table list
    sequentially; at scale, per-item Spark jobs already parallelize
    inside the cluster, so driver-side sequencing is not a bottleneck)."""
    return [fn(item) for item in items]

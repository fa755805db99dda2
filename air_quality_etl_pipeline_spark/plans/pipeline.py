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
from datetime import datetime, timedelta


def _parse_cron_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    """One cron field → the set of matching values. Supports ``*``,
    ``*/step``, ``a``, ``a-b``, ``a-b/step`` and comma lists; dow 7 is
    normalized to 0 (both mean Sunday, as in Vixie cron)."""
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron step must be >= 1: {spec!r}")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
        # dow allows the literal 7 as a Sunday alias (Vixie cron); any
        # other out-of-range bound must raise BEFORE the %7 wrap below,
        # or '5-9' would silently become Fri–Tue instead of an error
        wiggle = 1 if hi == 6 else 0
        if not (lo <= a <= hi + wiggle and a <= b <= hi + wiggle):
            raise ValueError(f"cron field out of range: {spec!r}")
        out.update(range(a, b + 1, step))
    if hi == 6:  # day-of-week: only the value 7 wraps (7 == Sunday == 0)
        out = {v % 7 for v in out}
    if any(v < lo or v > hi for v in out):
        raise ValueError(f"cron field out of range: {spec!r}")
    return frozenset(out)


@dataclass(frozen=True)
class Schedule:
    """C4 — the reference's weekly trigger (``Automated Pipeline.
    DataPipeline/.schedules:4-17``: Weekly, Thursday 06:00, Central
    Standard Time) generalized to a 5-field cron expression
    ``minute hour day-of-month month day-of-week``.

    Matching semantics are Vixie cron: when BOTH day-of-month and
    day-of-week are restricted (neither is ``*``), a day matches if
    EITHER does; otherwise the restricted one governs. ``next_fire``
    walks days (not minutes), so the worst case (Feb 29) stays cheap.
    The reference's schedule is ``Schedule.weekly("thursday", 6)``.
    """

    cron: str

    _DOW = {
        "sunday": 0, "monday": 1, "tuesday": 2, "wednesday": 3,
        "thursday": 4, "friday": 5, "saturday": 6,
    }

    def __post_init__(self) -> None:
        fields = self.cron.split()
        if len(fields) != 5:
            raise ValueError(f"cron needs 5 fields: {self.cron!r}")
        m, h, dom, mon, dow = fields
        object.__setattr__(self, "minutes", _parse_cron_field(m, 0, 59))
        object.__setattr__(self, "hours", _parse_cron_field(h, 0, 23))
        object.__setattr__(self, "doms", _parse_cron_field(dom, 1, 31))
        object.__setattr__(self, "months", _parse_cron_field(mon, 1, 12))
        object.__setattr__(self, "dows", _parse_cron_field(dow, 0, 6))
        object.__setattr__(
            self, "_dom_any", dom == "*"
        )
        object.__setattr__(self, "_dow_any", dow == "*")

    @classmethod
    def weekly(cls, day: str, hour: int, minute: int = 0) -> "Schedule":
        """The reference's trigger shape: weekly on *day* at *hour*."""
        return cls(f"{minute} {hour} * * {cls._DOW[day.lower()]}")

    def _day_matches(self, d: datetime) -> bool:
        dom_ok = d.day in self.doms
        dow_ok = (d.isoweekday() % 7) in self.dows
        if self._dom_any and self._dow_any:
            return True
        if self._dom_any:
            return dow_ok
        if self._dow_any:
            return dom_ok
        return dom_ok or dow_ok  # Vixie-cron OR semantics

    def next_fire(self, after: datetime) -> datetime:
        """First fire time strictly after *after* (minute granularity)."""
        t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
        # Bounded walk. The worst real gap is '0 0 29 2 *' straddling a
        # skipped century leap year: 2096-02-29 → 2104-02-29 is 8 years,
        # so 5 years would falsely report "never fires" there — walk 9.
        for _ in range(366 * 9):
            if t.month in self.months and self._day_matches(t):
                for hh in sorted(self.hours):
                    if hh < t.hour:
                        continue
                    for mm in sorted(self.minutes):
                        if hh == t.hour and mm < t.minute:
                            continue
                        return t.replace(hour=hh, minute=mm)
            t = (t + timedelta(days=1)).replace(hour=0, minute=0)
        raise ValueError(f"cron never fires: {self.cron!r}")

    def is_due(self, now: datetime, last_run: datetime | None) -> bool:
        """True when a run is owed: a fire time exists in
        ``(last_run, now]`` (first call: fires due in the minute of
        *now*)."""
        anchor = last_run if last_run is not None else now - timedelta(minutes=1)
        return self.next_fire(anchor) <= now


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


@dataclass
class ScheduledPipeline:
    """C1+C4: a DAG plus its trigger. ``run_if_due`` is the unit a
    scheduler loop (or an external cron) calls each tick — it runs the
    DAG only when the schedule owes a fire since *last_run*, returning
    None otherwise. No daemon loop lives here: at 100-TB scale the tick
    comes from the cluster scheduler (Airflow/cron), and keeping this
    side-effect-free per call makes catch-up and backfill decisions
    explicit at the call site."""

    activities: Sequence[Activity]
    schedule: Schedule | None = None

    def run_if_due(
        self,
        now: datetime,
        last_run: datetime | None = None,
        context: dict | None = None,
    ) -> PipelineRun | None:
        if self.schedule is not None and not self.schedule.is_due(now, last_run):
            return None
        return run_pipeline(self.activities, context)


def foreach(
    items: Sequence, fn: Callable[[object], object]
) -> list:
    """C2: sequential ForEach (the reference iterates its table list
    sequentially; at scale, per-item Spark jobs already parallelize
    inside the cluster, so driver-side sequencing is not a bottleneck)."""
    return [fn(item) for item in items]

"""Live progress surface — the analog of the reference's progress reporter
(``src/utils/progress.rs:1-155``: live per-stage progress bars with ETA).

A Spark job's unit of visible work is the STAGE (a shuffle-bounded task
set), so the reporter polls ``SparkContext.statusTracker()`` from a driver
daemon thread and emits one line per active stage: tasks done/total, a
percentage, and an ETA extrapolated from the stage's own task-completion
rate. Pure observation — it never touches the job plan, adds no listener to
the JVM, and costs one status-tracker RPC per interval.

Enable via ``run_pipeline(..., progress=True)`` (stage lines + pipeline
stage-boundary lines) or the CLI ``--progress`` flag.
"""

from __future__ import annotations

import sys
import threading
import time


class ProgressReporter:
    """Context manager printing periodic per-stage progress lines.

    >>> with ProgressReporter(spark, interval=10.0):
    ...     run_pipeline(spark, transcripts)

    Lines go to ``sink`` (default: stderr, keeping stdout clean for report
    payloads — the reference draws its bars on the terminal the same way).
    """

    #: Floor on the polling cadence: interval 0 (e.g. `--progress 0`) would
    #: make the poll loop's Event.wait(0.0) a tight spin, pegging a driver
    #: core with statusTracker RPCs for the whole run.
    MIN_INTERVAL = 0.5

    def __init__(self, spark, interval: float = 10.0, sink=None):
        interval = max(float(interval), self.MIN_INTERVAL)
        self.spark = spark
        self.interval = float(interval)
        self.sink = sink or (lambda line: print(line, file=sys.stderr, flush=True))
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._first_seen: dict[int, tuple[float, int]] = {}

    # -- lifecycle --------------------------------------------------------

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(
            target=self._loop, name="translink-progress", daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 1.0)

    # -- polling ----------------------------------------------------------

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                self._tick()
            except Exception:
                # observation must never kill the job, but neither may one
                # transient RPC failure (a driver GC pause hours into a
                # run) permanently silence the reporter — skip the tick
                # and poll again; teardown stops the loop via _stop
                continue

    def _tick(self) -> None:
        tracker = self.spark.sparkContext.statusTracker()
        now = time.time()
        for sid in sorted(tracker.getActiveStageIds()):
            info = tracker.getStageInfo(sid)
            if info is None or info.numTasks == 0:
                continue
            done, total = info.numCompletedTasks, info.numTasks
            seen = self._first_seen.setdefault(sid, (now, done))
            eta = ""
            dt, d0 = now - seen[0], done - seen[1]
            if d0 > 0 and done < total:
                eta = f" eta {dt / d0 * (total - done):.0f}s"
            pct = 100.0 * done / total
            name = (info.name or "").split("\n")[0][:60]
            self.sink(
                f"[progress] stage {sid} {name}: {done}/{total} tasks "
                f"({pct:.0f}%, {info.numActiveTasks} running"
                f"{', ' + str(info.numFailedTasks) + ' failed' if info.numFailedTasks else ''}"
                f"){eta}"
            )


class _NullReporter:
    """No-op stand-in so call sites can ``with make_reporter(...)``
    unconditionally."""

    def __enter__(self) -> "_NullReporter":
        return self

    def __exit__(self, *exc) -> None:
        return None

    def sink(self, line: str) -> None:  # pragma: no cover - trivial
        return None


def make_reporter(spark, progress: bool | float, sink=None):
    """``progress`` as run_pipeline accepts it: False -> no-op, True -> the
    10s default cadence, a number -> that polling interval in seconds."""
    if progress is False or progress is None:
        return _NullReporter()
    interval = 10.0 if progress is True else float(progress)
    return ProgressReporter(spark, interval=interval, sink=sink)

"""Progress surface: per-stage task progress lines + pipeline stage
boundaries (reference ``src/utils/progress.rs:1-155`` live progress bars)."""

from translink.config import LinkConfig
from translink.pipeline import run_pipeline
from translink.progress import ProgressReporter, make_reporter


def test_reporter_emits_stage_lines(spark, tiny):
    """Drive _tick() directly against a live job — the daemon-thread cadence
    is exercised by test_pipeline_progress_boundary_lines; racing a fixed
    interval against job latency made this flaky under full-suite load."""
    import threading
    import time

    lines = []
    rep = ProgressReporter(spark, interval=60.0, sink=lines.append)

    def job():
        spark.range(0, 60_000_000, 1, 16).selectExpr(
            "bit_xor(xxhash64(id, id + 1, id + 2))"
        ).collect()

    t = threading.Thread(target=job)
    with rep:
        t.start()
        deadline = time.time() + 120
        while t.is_alive() and time.time() < deadline:
            rep._tick()
            if any("[progress] stage" in ln and "tasks" in ln for ln in lines):
                break
            time.sleep(0.02)
        t.join()
    assert any("[progress] stage" in ln and "tasks" in ln for ln in lines), lines


def test_pipeline_progress_boundary_lines(spark, tiny):
    lines = []
    rep = make_reporter(spark, True, sink=lines.append)
    assert isinstance(rep, ProgressReporter)
    run_pipeline(spark, tiny["transcripts"], LinkConfig(), progress=0.5)
    # progress=False is a no-op reporter
    assert make_reporter(spark, False).__enter__() is not None


def test_pipeline_stage_lines_via_custom_sink(spark, tiny, monkeypatch):
    """Stage-boundary lines ride the reporter sink."""
    import translink.pipeline as pl
    from translink import progress as prog

    lines = []
    real = prog.make_reporter

    def capture(spark_, p, sink=None):
        return real(spark_, p, sink=lines.append)

    monkeypatch.setattr(prog, "make_reporter", capture)
    run_pipeline(spark, tiny["transcripts"], LinkConfig(), progress=True)
    stages = [ln for ln in lines if ln.startswith("[pipeline] stage")]
    assert len(stages) == 6, lines
    assert any("canonical" in ln for ln in stages)


def test_interval_zero_is_clamped(spark):
    """`--progress 0` must not busy-spin: the reporter clamps the polling
    interval to a floor instead of Event.wait(0.0)-spinning a core."""
    from translink.progress import ProgressReporter, make_reporter

    r = make_reporter(spark, progress=0)
    assert r is not None and r.interval >= ProgressReporter.MIN_INTERVAL

"""Progress surface: per-stage task progress lines + pipeline stage
boundaries (reference ``src/utils/progress.rs:1-155`` live progress bars)."""

from translink.config import LinkConfig
from translink.pipeline import run_pipeline
from translink.progress import ProgressReporter, make_reporter


def test_reporter_emits_stage_lines(spark, tiny):
    lines = []
    with ProgressReporter(spark, interval=0.2, sink=lines.append):
        # a job slow enough to straddle several polling ticks
        spark.range(0, 2_000_000, 1, 16).selectExpr(
            "bit_xor(xxhash64(id, id + 1, id + 2))"
        ).collect()
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

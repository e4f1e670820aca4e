"""Report layer: remove-mode materialization, cluster rollups with group
similarity (H14), text formatter golden substrings — mirrors the reference's
report tests (``tests/report_test.rs:36-64`` stats arithmetic, ``:83-104``
singleton exclusion, ``:106-141`` primary election, ``:143-229`` format
validity; text golden tests ``src/report/formatters/text.rs:105-158``)."""

import pytest
from pyspark.sql import functions as F

from translink.canonicalize import canonicalize
from translink.clustering import clusters_with_singletons, exact_clusters
from translink.config import LinkConfig
from translink.report import (
    cluster_report,
    deduplicate,
    elect_primary,
    format_text_report,
    global_stats,
)
from translink.signatures import with_exact_digest


@pytest.fixture(scope="module")
def members(spark, tiny):
    cfg = LinkConfig()
    canonical = canonicalize(tiny["transcripts"], cfg)
    signed = with_exact_digest(canonical)
    ec = exact_clusters(signed)
    clusters = clusters_with_singletons(
        signed.select("conv_id"), ec.select("conv_id", "cluster_id")
    )
    return elect_primary(clusters, canonical).cache()


def test_deduplicate_keeps_one_per_cluster(spark, members):
    kept = deduplicate(members)
    # exactly one primary per cluster, and every cluster survives
    assert kept.count() == members.select("cluster_id").distinct().count()
    assert kept.groupBy("cluster_id").count().filter("count > 1").count() == 0
    # kept + dropped partitions the corpus
    dropped = members.filter(~F.col("is_primary"))
    assert kept.count() + dropped.count() == members.count()


def test_deduplicate_keeps_newest(spark, members):
    """The primary (kept) member is the newest of its cluster — reference
    keeps the first after sorting by modified desc (src/report/mod.rs:133-137)."""
    kept = deduplicate(members).select("cluster_id", "max_ts")
    newest = members.groupBy("cluster_id").agg(F.max("max_ts").alias("newest"))
    bad = kept.join(newest, "cluster_id").filter(
        F.col("max_ts") != F.col("newest")
    )
    assert bad.count() == 0


def test_stats_arithmetic(spark, members):
    stats = global_stats(members)
    assert stats["n_records"] == members.count()
    assert stats["n_duplicates"] == members.filter(~F.col("is_primary")).count()
    # savings = total chars of non-primary members
    manual = (
        members.filter(~F.col("is_primary"))
        .agg(F.sum("total_chars")).first()[0] or 0
    )
    assert stats["savings_chars"] == manual


def test_cluster_report_excludes_singletons(spark, members):
    rep = cluster_report(members)
    assert rep.filter(F.col("n_members") < 2).count() == 0


def test_cluster_report_group_similarity(spark, members):
    """H14: mean intra-cluster pair score. Pure exact clusters (no scored
    pairs) default to 1.0; clusters with scored pairs average them."""
    rep = cluster_report(members, scored=None)
    assert "mean_similarity" not in rep.columns

    scored = spark.createDataFrame(
        [("x", "y", 0.8), ("x", "z", 0.6)],
        "conv_id_a string, conv_id_b string, score double",
    )
    # synthetic members table: one cluster {x, y, z}, one exact cluster {a, b}
    m = spark.createDataFrame(
        [
            ("x", "cl1", 5, 100, None, True),
            ("y", "cl1", 5, 100, None, False),
            ("z", "cl1", 5, 100, None, False),
            ("a", "cl2", 3, 50, None, True),
            ("b", "cl2", 3, 50, None, False),
        ],
        "conv_id string, cluster_id string, n_turns long, total_chars long, "
        "max_ts timestamp, is_primary boolean",
    )
    rep2 = {r["cluster_id"]: r["mean_similarity"]
            for r in cluster_report(m, scored=scored).collect()}
    assert abs(rep2["cl1"] - 0.7) < 1e-12   # mean of 0.8, 0.6
    assert rep2["cl2"] == 1.0               # exact cluster, no scored pairs


def _big_cluster_members(spark, n_big=100):
    """One 100-member cluster (bigger than the old 64-rows-per-group cap),
    plus a smaller cluster, as an elect_primary-shaped members table."""
    rows = [(f"big{i:03d}", "clbig", 5, 100, None, i == 0) for i in range(n_big)]
    rows += [(f"sm{i}", "clsm", 3, 50, None, i == 0) for i in range(3)]
    return spark.createDataFrame(
        rows,
        "conv_id string, cluster_id string, n_turns long, total_chars long, "
        "max_ts timestamp, is_primary boolean",
    )


def test_interactive_drop_covers_full_large_cluster(spark):
    """A cluster with >64 members must be listed and dropped IN FULL — the
    old global row cap (max_groups * 64) silently kept its unlisted
    non-primary tail."""
    from translink.report import interactive_select

    m = _big_cluster_members(spark)
    answers = iter(["y", "y"])
    dropped = interactive_select(m, input_fn=lambda _: next(answers), max_groups=2)
    assert set(dropped) == {f"big{i:03d}" for i in range(1, 100)} | {"sm1", "sm2"}


def test_text_report_never_truncates_a_cluster(spark):
    txt = format_text_report(_big_cluster_members(spark), max_groups=2)
    # every one of the 100 members of the big cluster is listed
    for i in range(100):
        assert f"big{i:03d}" in txt
    assert "sm0" in txt and "sm2" in txt


def test_text_report_caps_cluster_count_not_rows(spark):
    """max_groups bounds CLUSTERS (ranked by savings); the lower-savings
    cluster falls out whole, never partially."""
    txt = format_text_report(_big_cluster_members(spark), max_groups=1)
    assert "big099" in txt
    assert "sm0" not in txt and "sm1" not in txt


def test_text_report_golden_substrings(spark, members):
    txt = format_text_report(members)
    assert "translink deduplication report" in txt
    assert "duplicate groups (by potential savings)" in txt
    assert "legend: [*] primary (kept)   [ ] duplicate (removable)" in txt
    assert "group 1" in txt
    assert "[*]" in txt and "[ ]" in txt  # at least one primary + one dup listed
    # stats lines present and aligned
    assert "conversations" in txt and "savings (chars)" in txt


def test_write_report_text_remote_style_path(spark, tmp_path):
    """fmt='text' must write through the Hadoop FileSystem for URI paths
    (json/csv already do via DataFrame writers): a driver-local open() on
    'file://...' or s3a fails after the whole pipeline already ran."""
    from translink.report import write_report

    members = spark.createDataFrame(
        [(1, "c1", 2, 10, None, True), (1, "c2", 2, 10, None, False)],
        "cluster_id long, conv_id string, n_turns long, total_chars long, "
        "max_ts timestamp, is_primary boolean",
    )
    out = f"file://{tmp_path}/report.txt"
    write_report(members, out, fmt="text")
    text = (tmp_path / "report.txt").read_text()
    assert "c1" in text

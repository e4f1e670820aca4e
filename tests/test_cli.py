"""CLI surface end-to-end: report mode, remove mode, config-file loading —
the reference's primary interface (clap CLI ``src/main.rs:23-57``,
OperationMode ``src/config.rs:41-47``)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from translink.cli import build_parser, config_from_args, main


@pytest.fixture(scope="module")
def input_parquet(spark, tiny, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "transcripts")
    tiny["transcripts"].write.mode("overwrite").parquet(path)
    return path


def test_report_mode_json(spark, input_parquet, tmp_path, capsys):
    out = str(tmp_path / "report_json")
    rc = main([
        "--input", input_parquet, "--output", out, "--format", "json",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_records"] > 0 and stats["output"] == out
    written = spark.read.json(out)
    assert written.count() == stats["n_records"]
    assert "is_primary" in written.columns


def test_remove_mode_writes_deduplicated_dataset(spark, input_parquet, tmp_path, capsys):
    out = str(tmp_path / "deduped")
    rc = main([
        "--input", input_parquet, "--mode", "remove", "--output", out,
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = spark.read.parquet(out)
    # one row per cluster, no conv_id twice, fewer rows than input convs
    assert kept.count() == stats["n_clusters"] == stats["kept"]
    assert kept.select("conv_id").distinct().count() == kept.count()
    n_convs = spark.read.parquet(input_parquet).select("conv_id").distinct().count()
    assert kept.count() < n_convs  # the fixture plants duplicates


def test_remove_mode_requires_output(input_parquet):
    with pytest.raises(SystemExit):
        main(["--input", input_parquet, "--mode", "remove"])


def test_text_report_format(spark, input_parquet, tmp_path, capsys):
    out = str(tmp_path / "report.txt")
    rc = main([
        "--input", input_parquet, "--output", out, "--format", "text",
    ])
    assert rc == 0
    txt = open(out).read()
    assert "translink deduplication report" in txt
    assert "legend: [*] primary (kept)" in txt


def test_config_file_and_env_reach_pipeline(tmp_path, monkeypatch):
    cfg_file = tmp_path / "t.yaml"
    cfg_file.write_text("threshold: 0.9\nmin_turns: 2\n")
    args = build_parser().parse_args(
        ["--input", "x", "--config", str(cfg_file)]
    )
    monkeypatch.setenv("TRANSLINK_MAX_BLOCK_SIZE", "32")
    cfg = config_from_args(args)
    assert cfg.threshold == 0.9
    assert cfg.min_turns == 2
    assert cfg.max_block_size == 32     # env override
    # CLI flag outranks file and env
    args2 = build_parser().parse_args(
        ["--input", "x", "--config", str(cfg_file), "--threshold", "0.5"]
    )
    assert config_from_args(args2).threshold == 0.5


def test_interactive_select_answers(spark, tiny):
    """Interactive mode honors per-group answers: y drops, n keeps,
    a drops everything remaining, q stops."""
    from translink.canonicalize import canonicalize
    from translink.clustering import clusters_with_singletons, exact_clusters
    from translink.config import LinkConfig
    from translink.report import elect_primary, interactive_select
    from translink.signatures import with_exact_digest

    canonical = canonicalize(tiny["transcripts"], LinkConfig())
    signed = with_exact_digest(canonical)
    clusters = clusters_with_singletons(
        signed.select("conv_id"),
        exact_clusters(signed).select("conv_id", "cluster_id"),
    )
    members = elect_primary(clusters, canonical).cache()
    n_groups = members.filter(~members.is_primary).select("cluster_id") \
        .distinct().count()
    assert n_groups >= 3

    # 'n' to the first group, 'a' to the second -> all groups except the
    # first contribute their duplicates
    answers = iter(["n", "a"])
    drop = interactive_select(members, input_fn=lambda _: next(answers))
    all_dups = members.filter(~members.is_primary).count()
    first_group_kept = len(drop) < all_dups
    assert first_group_kept and len(drop) > 0

    # 'q' immediately -> nothing dropped
    drop_q = interactive_select(members, input_fn=lambda _: "q")
    assert drop_q == []

    # default (empty answer) -> drop every group's duplicates
    drop_all = interactive_select(members, input_fn=lambda _: "")
    assert len(drop_all) == all_dups


def test_interactive_mode_cli(spark, input_parquet, tmp_path, capsys, monkeypatch):
    out = str(tmp_path / "inter")
    monkeypatch.setattr("builtins.input", lambda _="": "a")
    rc = main([
        "--input", input_parquet, "--mode", "interactive", "--output", out,
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = spark.read.parquet(out)
    assert kept.count() == stats["n_records"] - stats["dropped"]
    assert stats["dropped"] > 0


def test_link_mode_blend_json(spark, tiny, tmp_path, capsys):
    """--link-b switches the CLI to two-corpus linkage: planted _dup/_nd
    conversations as side B must match their base conversations."""
    from pyspark.sql import functions as F

    t = tiny["transcripts"]
    is_b = F.col("conv_id").rlike("_n?dup[0-9]+$")
    a_path = str(tmp_path / "side_a")
    b_path = str(tmp_path / "side_b")
    t.filter(~is_b).write.parquet(a_path)
    t.filter(is_b).write.parquet(b_path)
    out = str(tmp_path / "link_report")
    rc = main([
        "--input", a_path, "--link-b", b_path,
        "--output", out, "--format", "json",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["model"] == "blend" and stats["n_matches"] > 0
    written = spark.read.json(out)
    assert written.count() == stats["n_matches"]
    # every match links a planted twin to its own base conversation
    bad = written.filter(
        ~F.col("conv_id_b").startswith(F.col("conv_id_a"))
    ).count()
    assert bad == 0


def test_link_mode_fs_text(tiny, tmp_path, capsys):
    from pyspark.sql import functions as F

    t = tiny["transcripts"]
    is_b = F.col("conv_id").rlike("_n?dup[0-9]+$")
    a_path = str(tmp_path / "fs_a")
    b_path = str(tmp_path / "fs_b")
    t.filter(~is_b).write.parquet(a_path)
    t.filter(is_b).write.parquet(b_path)
    out = str(tmp_path / "fs_report.txt")
    rc = main([
        "--input", a_path, "--link-b", b_path, "--link-model", "fs",
        "--output", out, "--format", "text",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["model"] == "fs" and stats["n_matches"] > 0
    text = open(out).read()
    assert "translink linkage report" in text
    assert "match_weight=" in text

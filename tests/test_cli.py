"""CLI surface (reference __main__.py plac annotations re-expressed
as python -m handprint_spark): option validation, exit codes, and the
end-to-end pipeline sinks."""

import os

import pytest

from handprint_spark.__main__ import run_cli
from handprint_spark.errors import CannotProceed, ExitCode, run_with_exit_code


def test_version_and_list(capsys):
    assert run_cli(["-V"]) == 0
    assert run_cli(["-l"]) == 0
    out = capsys.readouterr().out
    assert "handprint_spark" in out
    assert "google" in out and "microsoft" in out


def test_bad_service_maps_to_bad_arg_exit():
    code, exc = run_with_exit_code(lambda: run_cli(["-s", "nosuch", "x"]))
    assert code == ExitCode.bad_arg
    assert isinstance(exc, CannotProceed)


def test_bad_display_and_shift_and_confidence():
    for argv in (
        ["-d", "bogus", "corpus"],
        ["-m", "1;2", "corpus"],
        ["-n", "7", "corpus"],
        [],  # no corpora
    ):
        code, _ = run_with_exit_code(lambda a=argv: run_cli(a))
        assert code == ExitCode.bad_arg, argv


def test_missing_corpus_is_file_error(tmp_path):
    code, _ = run_with_exit_code(
        lambda: run_cli(["-o", str(tmp_path), str(tmp_path / "nope")])
    )
    assert code == ExitCode.file_error


def test_add_creds_is_na_but_validates(tmp_path, capsys):
    creds = tmp_path / "creds.json"
    creds.write_text("{}")
    assert run_cli(["-a", "google", str(creds)]) == 0
    assert "no credentials" in capsys.readouterr().out
    code, _ = run_with_exit_code(
        lambda: run_cli(["-a", "google", str(tmp_path / "missing.json")])
    )
    assert code == ExitCode.file_error


def test_end_to_end_run_resume_and_compare(spark, sf_tiny, tmp_path, capsys):
    out = str(tmp_path / "out")
    n = run_cli(["-o", out, "-e", "-c", "-q", "-t", "4", sf_tiny])
    assert n > 0
    for sub in ("results", "lineage", "text", "json", "grid", "comparison"):
        assert os.path.isdir(os.path.join(out, sub)), sub

    # without -j a populated results sink must refuse (never clobber)
    code, _ = run_with_exit_code(
        lambda: run_cli(["-o", out, "-q", "-t", "4", sf_tiny])
    )
    assert code == ExitCode.file_error

    # with -j the anti-join resume finds nothing left to do, and NO
    # per-batch sink may re-append the first run's rows (fresh batch
    # id for text/json/comparison; batch-scoped render for grid)
    n_grid = spark.read.parquet(os.path.join(out, "grid")).count()
    assert run_cli(["-j", "-e", "-o", out, "-q", "-t", "4", sf_tiny]) == 0
    assert spark.read.parquet(os.path.join(out, "text")).count() == n
    assert spark.read.parquet(os.path.join(out, "grid")).count() == n_grid

    # the comparison sink holds one byte-exact TSV report per doc
    rows = spark.read.parquet(os.path.join(out, "comparison")).collect()
    assert len(rows) == n
    assert all("\t" in r.report for r in rows if r.report)


def test_from_file_filter(spark, sf_tiny, tmp_path):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(3).collect()
    keep = tmp_path / "keep.txt"
    keep.write_text("\n".join(str(r.doc_id) for r in docs))
    out = str(tmp_path / "out")
    n = run_cli(["-o", out, "-q", "-G", "-t", "4", "-f", str(keep), sf_tiny])
    assert n == 3


def test_no_grid_writes_annotated_sink(spark, sf_tiny, tmp_path):
    """-G skips ONLY the grid (the reference saves individual
    annotated images instead); the old render gate made plain -G skip
    BOTH sinks and silently produce no rendered output at all."""
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(2).collect()
    keep = tmp_path / "keep.txt"
    keep.write_text("\n".join(str(r.doc_id) for r in docs))
    out = str(tmp_path / "out")
    assert run_cli(["-o", out, "-q", "-G", "-t", "4", "-f", str(keep), sf_tiny]) == 2
    assert not os.path.isdir(os.path.join(out, "grid"))
    annotated = os.path.join(out, "annotated")
    assert os.path.isdir(annotated)
    assert spark.read.parquet(annotated).count() > 0


def test_from_file_tolerates_non_numeric_ids(spark, sf_tiny, tmp_path):
    """Keep ids are strings with a per-table try_cast: a non-numeric
    id (the engine's declared input shape allows them) filters
    instead of crashing int(); ids absent from the corpus drop out."""
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(2).collect()
    keep = tmp_path / "keep.txt"
    keep.write_text("\n".join([str(docs[0].doc_id), "doc-xyz", "  "]))
    out = str(tmp_path / "out")
    assert run_cli(["-o", out, "-q", "-G", "-t", "4", "-f", str(keep), sf_tiny]) == 1


def test_resume_skips_orphaned_results_batch_id(spark, sf_tiny, tmp_path):
    """A crash between the results append and the lineage append
    leaves orphaned results rows at max(lineage)+1; a resume must
    allocate PAST both sinks' high-water marks or the next corpus
    inherits the crashed batch's id and its per-batch sinks pick up
    the orphaned rows."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(2).collect()
    keep = tmp_path / "keep.txt"
    keep.write_text(str(docs[0].doc_id))
    out = str(tmp_path / "out")
    assert run_cli(["-o", out, "-q", "-G", "-t", "4", "-f", str(keep), sf_tiny]) == 1

    results_dir = os.path.join(out, "results")
    # orphan: a results row at batch_id 7 with NO lineage row (the
    # crash window), belonging to a doc outside the keep list
    prior = spark.read.parquet(results_dir)
    orphan = (
        prior.limit(1)
        .withColumn("doc_id", F.lit("orphan-doc"))
        .withColumn("batch_id", F.lit(7).cast(dict(prior.dtypes)["batch_id"]))
    )
    orphan.write.mode("append").parquet(results_dir)

    keep.write_text(str(docs[1].doc_id))
    assert run_cli(["-j", "-o", out, "-q", "-G", "-t", "4", "-f", str(keep), sf_tiny]) == 1
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    assert lineage.agg(F.max("batch_id")).first()[0] == 8  # past the orphan

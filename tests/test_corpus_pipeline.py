"""End-to-end curation pipeline (plans/corpus.py): correctness of the
composed pass, wave resume after a simulated crash, and the near-dup modes.
The full-composition VALUE contract is the oracle-gated `corpus_pipeline`
registry query (tests/test_queries_oracle.py); these tests cover what the
oracle can't: resumability, idempotent re-runs, and mode/knob behavior."""

import glob
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spinterps_spark.plans import checkpoint as C
from spinterps_spark.plans.corpus import run_corpus_pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _corpus_pdf(path):
    import duckdb

    return (
        duckdb.sql(
            f"SELECT * FROM read_parquet('{path}/corpus/wave=*/*.parquet')"
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_corpus_resume_recomputes_only_missing_wave(spark, tdir):
    docs = _docs(spark)
    full_dir = os.path.join(tdir, "full")
    m = run_corpus_pipeline(spark, docs, full_dir, n_waves=3, run_id="c1")
    assert m["corpus_rows"] > 0 and m["docs_kept"] > 0

    # independent second run, then simulate a crash: drop corpus wave 1's
    # output AND its lineage row (the crash happens before both exist)
    resume_dir = os.path.join(tdir, "resume")
    run_corpus_pipeline(spark, docs, resume_dir, n_waves=3, run_id="c2")
    shutil.rmtree(os.path.join(resume_dir, "corpus", "wave=1"))
    ck = C.CheckpointLog(spark, os.path.join(resume_dir, "ckpt"))
    kept_rows = ck.read().where(
        "NOT (tier = 'corpus' AND wave = 1)"
    ).toPandas()
    shutil.rmtree(os.path.join(resume_dir, "ckpt"))
    spark.createDataFrame(kept_rows).write.mode("overwrite").parquet(
        os.path.join(resume_dir, "ckpt")
    )

    # untouched wave dirs must not be rewritten by the resume
    def mtimes(wave):
        return sorted(
            (os.path.basename(f), os.path.getmtime(f))
            for f in glob.glob(
                os.path.join(resume_dir, "corpus", f"wave={wave}", "*.parquet")
            )
        )

    before = {w: mtimes(w) for w in (0, 2)}
    m2 = run_corpus_pipeline(spark, docs, resume_dir, n_waves=3, run_id="c2")
    assert m2["run_id"] == "c2"
    assert {w: mtimes(w) for w in (0, 2)} == before

    # resumed output identical to the single-shot run
    pd.testing.assert_frame_equal(_corpus_pdf(resume_dir), _corpus_pdf(full_dir))

    # exactly one 'done' lineage row per (tier, wave) after the resume
    ck2 = C.CheckpointLog(spark, os.path.join(resume_dir, "ckpt"))
    counts = (
        ck2.read().where("run_id = 'c2' and status = 'done'")
        .groupBy("tier", "wave").count().toPandas()
    )
    assert len(counts) == 1 + 3  # keep + 3 corpus waves
    assert (counts["count"] == 1).all()


def test_corpus_rerun_same_run_id_is_noop(spark, tdir):
    docs = _docs(spark)
    run_corpus_pipeline(spark, docs, tdir, n_waves=2, run_id="c3")
    n_ckpt = len(glob.glob(os.path.join(tdir, "ckpt", "*.parquet")))
    run_corpus_pipeline(spark, docs, tdir, n_waves=2, run_id="c3")
    assert len(glob.glob(os.path.join(tdir, "ckpt", "*.parquet"))) == n_ckpt


def test_corpus_neardup_mode_collapses_planted_dups(spark, tdir):
    """winnow mode: two planted near-identical docs collapse to the lower
    id; the unique doc survives; lang allowlist drops non-matching docs."""
    base = " ".join(f"w{i}" for i in range(40)) + " the a and of to in"
    rows = [
        (1, base),
        (2, base + " tail"),                       # near-dup of 1
        (3, " ".join(f"u{i}" for i in range(40))), # unique, stopword-free
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    m = run_corpus_pipeline(
        spark, docs, tdir, dedup_mode="winnow", jaccard=0.5,
        min_tokens=5, min_quality=0.1, n_waves=2,
    )
    assert m["docs_kept"] == 2  # doc 2 folded into doc 1
    out = _corpus_pdf(tdir)
    assert set(out["doc_id"]) == {1, 3}

    with pytest.raises(ValueError, match="dedup_mode"):
        run_corpus_pipeline(spark, docs, os.path.join(tdir, "x"),
                            dedup_mode="bogus")


def test_corpus_lang_allowlist(spark, tdir):
    rows = [
        (1, "the cat and the dog of the town went to the market in the rain "
            "that day and it was a good day for all of them to be there"),
        (2, "le chat et le chien de la ville est dans la rue avec un ami "
            "pour la journee et il est la avec vous pour le jour qui vient"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    run_corpus_pipeline(
        spark, docs, tdir, langs=["fr"], min_tokens=5, min_quality=0.0,
        n_waves=1,
    )
    out = _corpus_pdf(tdir)
    assert set(out["doc_id"]) == {2}
    assert (out["lang"] == "fr").all()

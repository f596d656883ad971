"""BENCH harness: headline throughput of the retention engine.

Prints ONE JSON line:
    {"metric": "rolled_up_points_per_sec", "value": N, "unit": "sec",
     "queries": {...per-stage and per-query seconds...}, "sf": ...}

- Engine throughput = input turns ingested through ALL retention tiers
  (1m/1h/1d rollup + spine + IDW gap-fill + Gorilla chunks) / wall-clock,
  on the deterministic synthetic transcript table scaled to $SPARK_GRAFT_SF_DIR.
- Also times the headline oracle-checked queries at the same sf dir.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     SPARK_GRAFT_BENCH_TURNS (override turn volume).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    # turn volume tied to sf tier (sf0.1 -> 2M turns: the bench scale from
    # BASELINE.md; correctness at this scale is covered by the pytest oracle)
    default_turns = {"sf0.001": 20_000, "sf0.01": 200_000, "sf0.1": 2_000_000}
    n_turns = int(
        os.environ.get("SPARK_GRAFT_BENCH_TURNS", default_turns.get(sf_name, 2_000_000))
    )

    from spinterps_spark import datagen, queries as Q
    from spinterps_spark.plans.pipeline import run_retention_pipeline
    from spinterps_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus * 2, 16))
    out = {}

    # ---- materialize input once (generation excluded from throughput)
    t0 = time.time()
    gen_dir = tempfile.mkdtemp(prefix="bench_transcripts_")
    datagen.transcripts_spark(spark, seed=42, n_turns_target=n_turns).write.mode(
        "overwrite"
    ).parquet(gen_dir)
    transcripts = spark.read.parquet(gen_dir)
    actual_turns = transcripts.count()
    out["datagen"] = round(time.time() - t0, 3)

    # ---- headline: full retention cascade. BEST-OF-3: this VM has
    # transient hypervisor steal (identical-code spreads of 1.8-3.3x are on
    # record, BENCH/BASELINE.md) — min-of-N is the honest estimator of
    # engine cost (VERDICT r2 next-step #3), and the MEDIAN is reported
    # beside it (VERDICT r3 'what's wrong' #4) so a steal-hit draw is
    # self-evident: min ~= median means a clean box, min << median means
    # the min is the engine and the median is the noise.
    n_pipeline_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PIPE_RUNS", "3")))
    pipe_secs = []
    best_metrics = None
    for i in range(n_pipeline_runs):
        work_dir = tempfile.mkdtemp(prefix="bench_pipeline_")
        t0 = time.time()
        metrics = run_retention_pipeline(
            spark,
            transcripts,
            work_dir,
            n_salt=16,
            n_waves=1,
            fill_method="IDW",
            fill_knobs={"chunk_buckets": 3840, "pad_buckets": 64},
            fuse_fill_and_chunks=True,
            n_turns_hint=actual_turns,
        )
        pipe_secs.append(time.time() - t0)
        if pipe_secs[-1] == min(pipe_secs):
            best_metrics = metrics  # tier breakdown must decompose the min
        if i < n_pipeline_runs - 1:
            shutil.rmtree(work_dir, ignore_errors=True)
        # the LAST draw's chunk table survives for the Gorilla metrics below
    import statistics

    pipeline_sec = min(pipe_secs)
    # true median (averages the middle pair for even run counts — the
    # upper-middle element would report the MAX under PIPE_RUNS=2)
    median_sec = statistics.median(pipe_secs)
    out["pipeline_all_tiers"] = round(pipeline_sec, 3)
    out["pipeline_median"] = round(median_sec, 3)
    out["pipeline_runs"] = [round(s, 3) for s in pipe_secs]
    for tier, m in best_metrics["tiers"].items():
        out[f"tier_{tier}"] = round(m["wall_sec"], 3)

    # ---- Gorilla effectiveness (VERDICT r4 next-step #5): compression
    # ratio vs the raw 16 B/point (8 B epoch + 8 B float64) and decode
    # throughput, measured on the 1m chunk table the headline pass just
    # wrote. Encoded size counts the real per-chunk overhead too
    # (first_ts 8 B + first_val 8 B + n 4 B + chunk_size 4 B), not just
    # the bitstreams.
    from pyspark.sql import functions as F

    from spinterps_spark.compress.gorilla import decode_tier_chunks

    chunks = spark.read.parquet(os.path.join(work_dir, "chunks/tier=1m/wave=*"))
    gstats = chunks.agg(
        F.sum("n").alias("pts"),
        F.sum(
            F.length("ts_d2d") + F.length("vals_xor") + F.lit(24)
        ).alias("enc_bytes"),
    ).collect()[0]
    if gstats["pts"]:  # sum() is NULL over an empty chunk table
        out["gorilla_points"] = int(gstats["pts"])
        out["gorilla_ratio"] = round(gstats["enc_bytes"] / (gstats["pts"] * 16.0), 4)
        dec_best = float("inf")
        for _ in range(2):
            t0 = time.time()
            decode_tier_chunks(chunks).write.format("noop").mode("overwrite").save()
            dec_best = min(dec_best, time.time() - t0)
        out["gorilla_decode_sec"] = round(dec_best, 3)
        out["gorilla_decode_pts_per_sec"] = round(gstats["pts"] / dec_best, 1)

    # ---- incremental refresh legs (r6): merge ~1% turn-deltas into the
    # store the headline pass just wrote (plans/refresh.py) — the
    # continuous-aggregate maintenance cost must scale with the DELTA, not
    # the history. The delta generators reuse low conversation indices, so
    # they re-touch existing conversations: merge + conv-scoped refill +
    # re-encode + latest-wins delta publish. Seed-777/778 turns are NEW
    # events for those conversations (never-ingested payloads landing in
    # existing buckets — the legal continuous-ingest shape; the contract
    # only forbids redelivering already-merged turns). The TYPICAL leg
    # runs FIRST, on the pristine store (its p50 claim needs an unmutated
    # baseline); the worst-case leg then runs with one prior delta in the
    # chain — one extra broadcast anti join, noise next to the mega-conv
    # refill it exists to measure, and conservative for a worst case.
    from spinterps_spark.plans.refresh import run_refresh_pass

    # typical case: ~1% delta WITHOUT the mega-conversation (refreshing
    # conv 0 re-fills its entire ~5%-of-volume history)
    ddir2 = tempfile.mkdtemp(prefix="bench_refresh_delta2_")
    datagen.transcripts_spark(
        spark, seed=778, n_turns_target=max(n_turns // 100, 1_000)
    ).where("conv_id != 'c00000000'").write.mode("overwrite").parquet(ddir2)
    delta2 = spark.read.parquet(ddir2)
    out["refresh_typical_delta_turns"] = delta2.count()
    t0 = time.time()
    rm2 = run_refresh_pass(
        spark, delta2, work_dir, tiers=("1m", "1h", "1d"),
        fill_method="IDW",
        fill_knobs={"chunk_buckets": 3840, "pad_buckets": 64},
        n_waves=1,
    )
    out["refresh_typical_sec"] = round(time.time() - t0, 3)
    out["refresh_typical_affected_convs"] = rm2["n_affected_convs"]
    shutil.rmtree(ddir2, ignore_errors=True)

    # worst case: the delta includes the mega-conv
    ddir = tempfile.mkdtemp(prefix="bench_refresh_delta_")
    datagen.transcripts_spark(
        spark, seed=777, n_turns_target=max(n_turns // 100, 1_000)
    ).write.mode("overwrite").parquet(ddir)
    delta = spark.read.parquet(ddir)
    out["refresh_delta_turns"] = delta.count()
    t0 = time.time()
    rm = run_refresh_pass(
        spark, delta, work_dir, tiers=("1m", "1h", "1d"),
        fill_method="IDW",
        fill_knobs={"chunk_buckets": 3840, "pad_buckets": 64},
        n_waves=1,
    )
    out["refresh_sec"] = round(time.time() - t0, 3)
    out["refresh_affected_convs"] = rm["n_affected_convs"]
    shutil.rmtree(ddir, ignore_errors=True)

    # ---- maintenance legs (late r6): fold the two refresh deltas the
    # legs above published back into one full generation per table
    # (plans/vacuum.run_flatten_pass — reads drop their per-delta anti
    # joins), then expire everything superseded (run_vacuum_pass). The
    # flatten cost is ONE scan+write of the 2M-turn tier; vacuum is
    # metadata + rmdir, and bytes_freed is the storage the
    # copy-on-write maintenance chain would otherwise leak forever.
    from spinterps_spark.plans.vacuum import run_flatten_pass, run_vacuum_pass

    t0 = time.time()
    for _tb in ("rollup", "chunks"):
        run_flatten_pass(spark, work_dir, "1m", table=_tb, n_waves=1)
    out["flatten_1m_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    vm = run_vacuum_pass(spark, work_dir, keep_last=1)
    out["vacuum_sec"] = round(time.time() - t0, 3)
    out["vacuum_bytes_freed"] = vm["bytes_freed"]
    shutil.rmtree(work_dir, ignore_errors=True)

    # ---- oracle-checked operator queries at sf_dir: 3 repeats, report min
    n_q = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_RUNS", "3")))
    for name in (
        "rollup_1m", "rollup_1d", "fleet_stats_1h", "idw_fill_all",
        "pair_variogram_types", "evg_binned", "variogram_fit_dim",
        "dedup_exact", "text_quality", "minhash_lsh", "cosine_topk",
        "ivf_cosine_topk", "winnow_dedup",
        "weighted_resample", "corpus_select",
    ):
        fn = Q.queries()[name]
        best = float("inf")
        for _ in range(n_q):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)

    throughput = actual_turns / pipeline_sec
    result = {
        "metric": "rolled_up_points_per_sec",
        "value": round(throughput, 1),
        "value_median": round(actual_turns / median_sec, 1),
        "unit": "sec",
        "queries": out,
        "sf": sf_name,
        "n_turns": actual_turns,
        "cpus": cpus,
    }

    # ---- sf1 leg (VERDICT r4 next-step #4): the ~20M-turn BASELINE.md
    # input volume through the SAME harness path as the sf0.1 gate, so the
    # scale claim no longer interpolates between two different harnesses.
    # SPARK_GRAFT_BENCH_SF1_RUNS=0 disables; default THREE draws (VERDICT
    # r6 next-step #5: a single sf1 draw made round-over-round comparisons
    # depend on which steal band it landed in — same min/median protocol
    # as the sf0.1 leg now).
    n_sf1 = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_RUNS", "3"))
    if n_sf1 > 0 and sf_name == "sf0.1":
        sf1_turns = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_TURNS", "19_600_000"))
        t0 = time.time()
        gen1 = tempfile.mkdtemp(prefix="bench_sf1_transcripts_")
        datagen.transcripts_spark(spark, seed=42, n_turns_target=sf1_turns).write.mode(
            "overwrite"
        ).parquet(gen1)
        tr1 = spark.read.parquet(gen1)
        sf1_n = tr1.count()
        result["sf1_datagen_sec"] = round(time.time() - t0, 3)
        sf1_secs = []
        for _ in range(n_sf1):
            wd1 = tempfile.mkdtemp(prefix="bench_sf1_pipeline_")
            t0 = time.time()
            run_retention_pipeline(
                spark, tr1, wd1,
                n_salt=16, n_waves=1, fill_method="IDW",
                fill_knobs={"chunk_buckets": 3840, "pad_buckets": 64},
                fuse_fill_and_chunks=True, n_turns_hint=sf1_n,
            )
            sf1_secs.append(time.time() - t0)
            shutil.rmtree(wd1, ignore_errors=True)
        shutil.rmtree(gen1, ignore_errors=True)
        result["sf1_n_turns"] = sf1_n
        result["sf1_pipeline_runs"] = [round(s, 3) for s in sf1_secs]
        result["sf1_pipeline_sec"] = round(min(sf1_secs), 3)
        result["sf1_value"] = round(sf1_n / min(sf1_secs), 1)
        result["sf1_value_median"] = round(sf1_n / statistics.median(sf1_secs), 1)

        # ---- sf1 dedup legs (VERDICT r5 next-step #5): the bucketed dedup
        # designs at 10x the sf0.1 documents volume, so the "bounded
        # fan-out" claim carries a 10x measurement next to the skew pytest.
        # 50k docs mirror the testdata documents distribution (31-token
        # vocab, 10-100 tokens/doc) with a deterministic near-dup lattice.
        from spinterps_spark import queries as Q

        docdir = tempfile.mkdtemp(prefix="bench_sf1_documents_")
        datagen.documents_spark(spark, seed=42, n_docs=50_000).write.mode(
            "overwrite"
        ).parquet(f"{docdir}/documents.parquet")
        qreg = Q.queries()
        for qname in ("minhash_lsh", "winnow_dedup"):
            t0 = time.time()
            n_rows = qreg[qname](spark, docdir).count()
            result[f"sf1_{qname}_sec"] = round(time.time() - t0, 3)
            result[f"sf1_{qname}_rows"] = n_rows
        shutil.rmtree(docdir, ignore_errors=True)

    print(json.dumps(result))
    shutil.rmtree(gen_dir, ignore_errors=True)
    shutil.rmtree(work_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

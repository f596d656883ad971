import numpy as np

from spinterps_spark import datagen
from spinterps_spark.compress.gorilla import decode_tier_chunks, encode_tier_chunks
from spinterps_spark.operators import gapfill as G
from spinterps_spark.operators import rollup as R
from spinterps_spark.operators import spine as S


def _ser(spark):
    t = datagen.transcripts_spark(spark, seed=42, n_turns_target=3000)
    h1 = R.rollup_tier(R.base_rollup(t, "1m"), "1h", min_cnt=1)
    return S.with_spine(h1, "1h").selectExpr(
        "conv_id", "bucket_ts", "tok_len_sum/turn_cnt AS v"
    )


def test_fused_equals_separate(spark):
    ser = _ser(spark)
    ser.persist()
    # separate: fill -> encode (two shuffles)
    filled = G.gapfill(ser, "v", method="IDW", tier="1h",
                       chunk_buckets=3840, pad_buckets=64)
    sep = encode_tier_chunks(filled.where("value_filled IS NOT NULL"), "1h")
    # fused: one grouped pass
    fus = G.gapfill(ser, "v", method="IDW", tier="1h",
                    chunk_buckets=3840, pad_buckets=64, emit="chunks")

    a = (
        decode_tier_chunks(sep).toPandas()
        .sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    )
    b = (
        decode_tier_chunks(fus).toPandas()
        .sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["bucket_ts"].to_numpy() == b["bucket_ts"].to_numpy()).all()
    av, bv = a["value"].to_numpy(), b["value"].to_numpy()
    assert ((av == bv) | (np.isnan(av) & np.isnan(bv))).all()
    ser.unpersist()


def test_fused_requires_aligned_chunks(spark):
    ser = _ser(spark)
    import pytest

    with pytest.raises(ValueError):
        G.gapfill(ser, "v", method="IDW", tier="1h",
                  chunk_buckets=1000, emit="chunks")

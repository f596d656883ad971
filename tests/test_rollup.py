import numpy as np
import pandas as pd

from spinterps_spark import METRIC_COLS, TIER_SECONDS, datagen
from spinterps_spark.operators import rollup as R
from spinterps_spark.operators import spine as S

from tests import oracle


def _sorted(pdf):
    return pdf.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)


def test_salted_equals_unsalted(spark):
    t = datagen.transcripts_spark(spark, seed=42, n_turns_target=4000)
    a = _sorted(R.base_rollup(t, "1m", n_salt=16).toPandas())
    b = _sorted(R.single_phase_rollup(t, "1m").toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_base_rollup_matches_oracle(spark):
    turns = datagen.transcripts_pandas(seed=42, n_turns_target=4000)
    sdf = spark.createDataFrame(turns)
    got = _sorted(R.base_rollup(sdf, "1m").toPandas())
    want = _sorted(oracle.rollup_pandas(turns, 60))
    for c in METRIC_COLS:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["valid"] == want["valid"]).all()
    assert got["bucket_ts"].equals(want["bucket_ts"])


def test_tier_cascade_matches_oracle(spark):
    turns = datagen.transcripts_pandas(seed=42, n_turns_target=4000)
    sdf = spark.createDataFrame(turns)
    m1 = R.base_rollup(sdf, "1m")
    h1 = R.rollup_tier(m1, "1h", min_cnt=3)
    d1 = R.rollup_tier(h1, "1d", min_cnt=2)

    o1 = oracle.rollup_pandas(turns, 60)
    oh = oracle.rollup_tier_pandas(o1, 3600, min_cnt=3)
    od = oracle.rollup_tier_pandas(oh, 86400, min_cnt=2)

    for got_df, want in ((h1, oh), (d1, od)):
        got = _sorted(got_df.toPandas())
        want = _sorted(want)
        assert len(got) == len(want)
        for c in METRIC_COLS:
            g = got[c].to_numpy(dtype=float)
            w = want[c].to_numpy(dtype=float)
            assert ((g == w) | (np.isnan(g) & np.isnan(w))).all(), c
        assert (got["valid"].to_numpy() == want["valid"].to_numpy()).all()


def test_spine_makes_gaps_explicit(spark):
    turns = datagen.transcripts_pandas(seed=42, n_turns_target=4000)
    sdf = spark.createDataFrame(turns)
    m1 = R.base_rollup(sdf, "1h")
    spined = S.with_spine(m1, "1h")
    got = _sorted(spined.toPandas())

    want = _sorted(
        oracle.spine_pandas(oracle.rollup_pandas(turns, 3600), 3600)[got.columns]
    )
    assert len(got) == len(want)
    assert (got["valid"].to_numpy() == want["valid"].to_numpy()).all()
    g = got["turn_cnt"].to_numpy(dtype=float)
    w = want["turn_cnt"].to_numpy(dtype=float)
    assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()
    # spine must contain real gaps, else gap-fill has nothing to do
    assert (~got["valid"]).sum() > 0


def test_derived_metrics(spark):
    turns = datagen.transcripts_pandas(seed=42, n_turns_target=2000)
    sdf = spark.createDataFrame(turns)
    got = R.derived_metrics(R.base_rollup(sdf, "1h")).toPandas()
    assert np.allclose(
        got["tok_len_mean"], got["tok_len_sum"] / got["turn_cnt"], rtol=0, atol=0
    )
    mix = got[["role_user_mix", "role_assistant_mix", "role_tool_mix"]].sum(axis=1)
    assert np.allclose(mix, 1.0)

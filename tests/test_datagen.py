import numpy as np
import pandas as pd

from spinterps_spark import datagen


def test_deterministic_and_pure():
    a = datagen.transcripts_pandas(seed=42, n_turns_target=2000)
    b = datagen.transcripts_pandas(seed=42, n_turns_target=2000)
    pd.testing.assert_frame_equal(a, b)
    c = datagen.transcripts_pandas(seed=7, n_turns_target=2000)
    assert not a["text"].equals(c["text"])


def test_schema_and_invariants():
    df = datagen.transcripts_pandas(seed=42, n_turns_target=2000)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # turn_idx dense + unique per conv; ts strictly increasing within conv
    for _, g in df.groupby("conv_id"):
        assert (g["turn_idx"].to_numpy() == np.arange(len(g))).all()
        assert g["ts"].is_monotonic_increasing
    # tool only on tool turns
    assert df.loc[df["role"] != "tool", "tool"].isna().all()
    assert df.loc[df["role"] == "tool", "tool"].notna().all()


def test_mega_conversation_skew():
    df = datagen.transcripts_pandas(seed=42, n_turns_target=5000)
    sizes = df.groupby("conv_id").size()
    assert sizes["c00000000"] == sizes.max()
    assert sizes["c00000000"] >= 0.03 * len(df)


def test_spark_generator_matches_pandas(spark):
    target = 3000
    sdf = datagen.transcripts_spark(spark, seed=42, n_turns_target=target)
    got = (
        sdf.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        datagen.transcripts_pandas(seed=42, n_turns_target=target)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got["turn_idx"] = got["turn_idx"].astype("int32")
    want["turn_idx"] = want["turn_idx"].astype("int32")
    pd.testing.assert_frame_equal(got, want)


def test_silence_holes_exist():
    df = datagen.transcripts_pandas(seed=42, n_turns_target=5000)
    gaps = df.groupby("conv_id")["ts"].diff().dt.total_seconds().dropna()
    assert (gaps >= 3600).any(), "no silence holes -> gap-fill untestable"


def test_documents_spark_matches_pandas(spark):
    import numpy as np

    sdf = datagen.documents_spark(spark, seed=42, n_docs=1000)
    got = sdf.toPandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        datagen.documents_pandas(42, np.arange(1000))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_documents_dup_lattice():
    import numpy as np

    d = datagen.documents_pandas(42, np.arange(5000))
    # exact-dup tail exists (id % 211 == 3 copies a raw low-id base)
    assert d.text.duplicated().sum() >= 10
    # near-dup mutation: same length, all-but-<=2 positions identical
    t1, t38 = d.text[1].split(), d.text[38].split()
    assert len(t1) == len(t38)
    assert sum(a != b for a, b in zip(t1, t38)) <= 2

"""Deterministic transcript/coords fixture parquet for correctness gates.

The driver's DuckDB oracle can only see parquet files, so transcript-engine
queries materialize their synthetic input once per scale under
/root/repo/.fixtures/ (idempotent, seed-pure — see datagen.py). Both the
Spark query and the DuckDB oracle SQL read the *same file*, so parity checks
compare computation, not generation.

Written with pyarrow directly (single deterministic file, no Spark needed),
timestamps as TIMESTAMP_MICROS so Spark and DuckDB agree on values.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from spinterps_spark import datagen

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixtures")

# aligned with TESTDATA.md lineitem scale per sf directory
N_TURNS_BY_SF = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}
SEED = 42


def _sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in N_TURNS_BY_SF else "sf0.01"


def transcripts_path(sf_dir: str) -> str:
    name = _sf_name(sf_dir)
    path = os.path.join(FIXTURE_DIR, f"transcripts_{name}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        pdf = datagen.transcripts_pandas(seed=SEED, n_turns_target=N_TURNS_BY_SF[name])
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        table = table.set_column(
            table.schema.get_field_index("turn_idx"),
            "turn_idx",
            table.column("turn_idx").cast(pa.int32()),
        )
        table = table.set_column(
            table.schema.get_field_index("ts"),
            "ts",
            table.column("ts").cast(pa.timestamp("us")),
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path


def coords_path(sf_dir: str) -> str:
    name = _sf_name(sf_dir)
    path = os.path.join(FIXTURE_DIR, f"conv_coords_{name}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        n_convs = len(datagen.plan_sizes(SEED, N_TURNS_BY_SF[name]))
        pdf = datagen.conv_coords_pandas(SEED, n_convs)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


MEDIA_N = 96


def media_path(n: int = MEDIA_N, seed: int = 5) -> str:
    """Deterministic media fixture parquet (multimodal oracle input): the
    same bytes synth_media builds, written once so DuckDB can read them.
    v3: ALL payloads are real public containers — RIFF/WAVE PCM16 audio,
    24-bit BI_RGB BMP images, YUV4MPEG2 Cmono video (multimodal.synth_*)."""
    path = os.path.join(FIXTURE_DIR, f"media_v3_{n}_{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        from spinterps_spark.operators.multimodal import media_rows

        rows = media_rows(n, seed)
        meta_type = pa.struct(
            [("width", pa.int32()), ("height", pa.int32()),
             ("n_frames", pa.int32()), ("sample_rate", pa.int32())]
        )
        table = pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "kind": pa.array([r[1] for r in rows], pa.string()),
                "payload": pa.array([r[2] for r in rows], pa.binary()),
                "meta": pa.array(
                    [dict(zip(("width", "height", "n_frames", "sample_rate"), r[3]))
                     for r in rows],
                    meta_type,
                ),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path


LANG_DOCS_N_PER_LANG = 40
LANG_DOCS_SEED = 9

# language-neutral content pool for the lang-ID fixture (domain nouns the
# stopword tables never contain)
_CONTENT_POOL = (
    "spark rollup bucket kriging variogram chunk gorilla tier spine conv "
    "turn token cluster lag sill range drift shuffle salt partition"
).split()


# script-language character pools for the lang fixture (codepoint
# ranges match functions/langid.SCRIPT_CLASSES)
_SCRIPT_POOLS = {
    "zh": [(0x4E00, 0x9FFF)],                      # CJK ideographs only
    "ja": [(0x3041, 0x3096), (0x30A1, 0x30FA),     # kana (3 of 4 pool
           (0x3041, 0x3096), (0x4E00, 0x9FFF)],    # entries ~ 75%) + kanji
    "ru": [(0x0410, 0x044F)],                      # Cyrillic letters
    "ar": [(0x0621, 0x064A)],                      # Arabic letters
    "ko": [(0xAC00, 0xD7A3)],                      # Hangul syllables
}


def _script_word(rng, lang: str) -> str:
    pools = _SCRIPT_POOLS[lang]
    n = int(rng.randint(2, 6))
    chars = []
    for _ in range(n):
        lo, hi = pools[rng.randint(len(pools))]
        chars.append(chr(int(rng.randint(lo, hi + 1))))
    return "".join(chars)


def lang_docs_path(
    n_per_lang: int = LANG_DOCS_N_PER_LANG, seed: int = LANG_DOCS_SEED
) -> str:
    """Deterministic multi-language document fixture (v3, 10 truth labels):
    Latin-script docs mix shared content tokens with ~35% stopwords drawn
    from ONE language's public table (functions/langid.py); zh/ja/ru/ar/ko
    docs are seeded words over the matching Unicode script block (ja mixes
    ~75% kana with kanji — the kana evidence that separates it from zh);
    plus stopword-free Latin 'unk' docs AND two degenerate docs (empty
    string, whitespace-only) that must score 0.0 everywhere and fall
    through to 'unk' without tripping ANSI DIVIDE_BY_ZERO (ADVICE r4
    high). The seeded fixture a real language-ID operator must separate
    at 100% accuracy."""
    path = os.path.join(FIXTURE_DIR, f"lang_docs_v4_{n_per_lang}_{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        import numpy as np

        from spinterps_spark.functions.langid import (
            SCRIPT_LANGS, STOPWORDS_BY_LANG,
        )

        rng = np.random.RandomState(seed)
        rows = []
        doc_id = 0
        for lang in list(STOPWORDS_BY_LANG) + list(SCRIPT_LANGS) + ["unk"]:
            words = STOPWORDS_BY_LANG.get(lang, ())
            for _ in range(n_per_lang):
                n_tok = int(rng.randint(30, 80))
                if lang in _SCRIPT_POOLS:
                    toks = [_script_word(rng, lang) for _ in range(n_tok)]
                else:
                    toks = [
                        _CONTENT_POOL[rng.randint(len(_CONTENT_POOL))]
                        for _ in range(n_tok)
                    ]
                    if words:
                        n_sw = max(2, int(0.35 * n_tok))
                        pos = rng.choice(n_tok, size=min(n_sw, n_tok), replace=False)
                        for p in pos:
                            toks[int(p)] = words[rng.randint(len(words))]
                rows.append((doc_id, lang, " ".join(toks)))
                doc_id += 1
        # degenerate docs: every score divisor (token count, non-space
        # char count) is zero — both engines must emit 'unk', not throw
        rows.append((doc_id, "unk", ""))
        rows.append((doc_id + 1, "unk", "   "))
        table = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang_true": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path


PII_DOCS_N = 120
PII_DOCS_SEED = 31


def pii_docs_path(n: int = PII_DOCS_N, seed: int = PII_DOCS_SEED) -> str:
    """Deterministic PII fixture: docs mixing clean content tokens with
    planted emails / card numbers / phone numbers / IPv4 addresses, plus
    fully clean docs. Ground-truth per-kind counts ride along so the
    oracle row-hash locks DETECTION ACCURACY (n_* == the planted counts),
    not just determinism — the lang_docs pattern."""
    path = os.path.join(FIXTURE_DIR, f"pii_docs_{n}_{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        import numpy as np

        rng = np.random.RandomState(seed)
        mk = {
            "email": lambda r: "user%d@mail%d.example.com" % (r.randint(999), r.randint(99)),
            "card": lambda r: "%04d-%04d-%04d-%04d" % tuple(r.randint(0, 10_000, 4)),
            "phone": lambda r: "+%d %03d %04d" % (r.randint(1, 99), r.randint(100, 999), r.randint(1000, 9999)),
            "ipv4": lambda r: "%d.%d.%d.%d" % tuple(r.randint(1, 255, 4)),
        }
        rows = []
        for doc_id in range(n):
            toks = [
                _CONTENT_POOL[rng.randint(len(_CONTENT_POOL))]
                for _ in range(int(rng.randint(20, 50)))
            ]
            counts = dict.fromkeys(mk, 0)
            if doc_id % 4 != 3:  # every 4th doc stays clean
                for kind in mk:
                    for _ in range(int(rng.randint(0, 3))):
                        toks.insert(int(rng.randint(len(toks))), mk[kind](rng))
                        counts[kind] += 1
            rows.append(
                (doc_id, " ".join(toks), counts["email"], counts["card"],
                 counts["phone"], counts["ipv4"])
            )
        table = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "true_email": pa.array([r[2] for r in rows], pa.int64()),
                "true_card": pa.array([r[3] for r in rows], pa.int64()),
                "true_phone": pa.array([r[4] for r in rows], pa.int64()),
                "true_ipv4": pa.array([r[5] for r in rows], pa.int64()),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path


CSV_EVENTS_N = 4_000
JSONL_TURNS_N = 3_000


def csv_events_path(sf_dir: str, n: int = CSV_EVENTS_N) -> str:
    """Deterministic CSV source fixture (S1 analog): the first n events
    rows re-written as comma-separated text with an epoch-seconds ts
    column (epoch dodges engine-specific timestamp FORMAT parsing — the
    parity under test is CSV tokenization/quoting/typing, not strptime).
    Text fields carry spaces; values keep their 2 decimals."""
    name = _sf_name(sf_dir)
    path = os.path.join(FIXTURE_DIR, f"csv_events_{name}_{n}.csv")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        import pandas as pd

        pdf = (
            pd.read_parquet(f"{sf_dir}/events.parquet")
            .sort_values("event_id").head(n)
        )
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "ts_epoch": pdf["ts"].astype("datetime64[us]").astype("int64") // 1_000_000,
                "user_id": pdf["user_id"],
                "event_type": pdf["event_type"],
                "value": pdf["value"],
            }
        )
        tmp = path + ".tmp"
        out.to_csv(tmp, index=False)
        os.replace(tmp, path)
    return path


def jsonl_turns_path(sf_dir: str, n: int = JSONL_TURNS_N) -> str:
    """Deterministic JSONL source fixture: the first n transcript turns as
    newline-delimited JSON with epoch-seconds ts — the arrival format of
    real LLM-transcript feeds. Text fields carry spaces."""
    name = _sf_name(sf_dir)
    path = os.path.join(FIXTURE_DIR, f"jsonl_turns_{name}_{n}.jsonl")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        import json as _json

        import pandas as pd

        pdf = (
            pd.read_parquet(transcripts_path(sf_dir))
            .sort_values(["conv_id", "turn_idx"]).head(n)
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for r in pdf.itertuples(index=False):
                f.write(_json.dumps({
                    "conv_id": r.conv_id,
                    "turn_idx": int(r.turn_idx),
                    "role": r.role,
                    "text": r.text,
                    "tool": r.tool,
                    "ts_epoch": int(pd.Timestamp(r.ts).value // 10**9),
                }) + "\n")
        os.replace(tmp, path)
    return path


def load_transcripts(spark, sf_dir: str):
    return spark.read.parquet(transcripts_path(sf_dir))


def load_coords(spark, sf_dir: str):
    return spark.read.parquet(coords_path(sf_dir))

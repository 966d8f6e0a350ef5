"""Edge-case Spark↔DuckDB parity for every documents-based oracled
query: the driver's fixtures are well-formed ASCII, so the standing
gate can't catch divergence on pathological rows (empty text,
whitespace-only, letterless, single-token, huge repetition). This
suite runs the same oracle comparison on a crafted nasty table."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from equi7grid_spark.queries import oracle_sql, queries

NASTY_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, ""),                           # empty text
    (2, " "),                          # single space -> ['', '']
    (3, "   "),                        # spaces only
    (4, "word"),                       # single token, no shingle
    (5, "123 456 789 000"),            # letterless (lang ratio /0)
    (6, "a e i o u"),                  # vowels only (consonants 0)
    (7, "bcd fgh jkl mnp qrs tvw xyz bcd fgh jkl"),  # no vowels
    (8, "the quick brown fox jumps over the lazy dog again and again"),
    (9, ("dup " * 50).strip()),        # one token repeated
    (10, ("dup " * 50).strip()),       # exact duplicate of 9
    (11, "Tab\tand\nnewline separated"),  # non-space whitespace
]

DOC_QUERIES = [
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "corpus_curation",
]


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty")
    spark.createDataFrame(NASTY_DOCS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def nasty_duck(nasty_dir):
    con = duckdb.connect()
    # Spark writes a part-file directory; DuckDB needs the file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nasty_dir}/documents.parquet/*.parquet')"
    )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_nasty_docs_parity(spark, nasty_dir, nasty_duck, name):
    sdf = _normalize(queries()[name](spark, nasty_dir).toPandas())
    odf = _normalize(nasty_duck.execute(oracle_sql()[name]).fetchdf())
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, atol=0, rtol=0)


NASTY_VECS = [
    # ids < 10 are the ANN query side, so the nasty rows exercise it
    *[(i, [float((i * 7 + k) % 9) - 4.0 for k in range(64)]) for i in range(8)],
    (8, [0.0] * 64),                 # zero vector -> zero norm
    (9, None),                       # NULL embedding
    *[(10 + i, [float((i * 13 + k) % 11) - 5.0 for k in range(64)]) for i in range(30)],
]

ANN_QUERIES = ["ann_cosine_topk", "ann_lsh_bucketed", "embedding_near_dup"]


@pytest.fixture(scope="module")
def nasty_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_emb")
    spark.createDataFrame(
        NASTY_VECS, "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def nasty_emb_duck(nasty_emb_dir):
    con = duckdb.connect()
    # materialize WITHOUT NULL rows: DuckDB 1.0.0 pushes join-key
    # projections into the scan below ANY IS NOT NULL filter (view- or
    # CTE-level; COALESCE gets optimized away against the filter) and
    # its vectorized list_inner_product rejects batches with NULL rows
    # — so the oracle needs physically NULL-free storage. The Spark
    # side still reads the raw parquet WITH the NULL row and must
    # filter it itself (that robustness is what this test pins).
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM "
        f"read_parquet('{nasty_emb_dir}/embeddings.parquet/*.parquet') "
        "WHERE embedding IS NOT NULL"
    )
    return con


@pytest.mark.parametrize("name", ANN_QUERIES)
def test_nasty_embeddings_parity(spark, nasty_emb_dir, nasty_emb_duck, name):
    """Zero-norm and NULL embeddings must not crash (ANSI try_divide)
    and must rank/filter identically to the DuckDB oracle."""
    sdf = _normalize(queries()[name](spark, nasty_emb_dir).toPandas())
    odf = _normalize(nasty_emb_duck.execute(oracle_sql()[name]).fetchdf())
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, atol=0, rtol=0)

"""JSONL ingest with corrupt-record quarantine (sources/readers.py):
the lenient-ingest contract of the ride CSV, for the wire format
document corpora actually arrive in."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.sources.readers import (
    jsonl_corrupt_audit,
    read_documents_jsonl,
)


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    good = [
        {"doc_id": 1, "text": "alpha bravo", "lang": "en", "source": "s1", "n_chars": 11},
        {"doc_id": 2, "text": "charlie", "lang": "de", "source": "s2", "n_chars": 7},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, '{"doc_id": 3, "text": "broken')   # truncated JSON
    lines.append("not json at all")                     # garbage line
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")

    df = read_documents_jsonl(spark, str(p))
    assert jsonl_corrupt_audit(df) == 2

    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    rows = {(r["doc_id"], r["text"]) for r in clean.collect()}
    assert rows == {(1, "alpha bravo"), (2, "charlie")}

    # quarantine keeps the raw line for the dead-letter table
    bad = {
        r["_corrupt_record"]
        for r in df.filter(F.col("_corrupt_record").isNotNull()).collect()
    }
    assert bad == {'{"doc_id": 3, "text": "broken', "not json at all"}


def test_jsonl_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    """Parquet documents written as JSONL and read back are identical
    (modulo the quarantine column) — format conversion is lossless."""
    from citybikedatawarehouse_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    docs.write.json(out)
    back = read_documents_jsonl(spark, out)
    assert jsonl_corrupt_audit(back) == 0
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    key = lambda df: sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())
    assert key(back) == key(docs)


def test_orc_round_trip_preserves_query_results(spark, tmp_path):
    """documents written as ORC and read back must answer a catalog
    query identically to the parquet original — including the nested
    writes (partitioned by source)."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.sources.readers import load_table, read_orc
    from citybikedatawarehouse_spark.sources.writers import write_orc

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(d, path, partition_by=("source",))
    back = read_orc(spark, path)
    a = sorted(
        (r["source"], r["n"], r["c"])
        for r in d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("c"))
        .collect()
    )
    b = sorted(
        (r["source"], r["n"], r["c"])
        for r in back.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("c"))
        .collect()
    )
    assert a == b
    assert set(back.columns) == set(d.columns)

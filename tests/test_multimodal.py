"""Multimodal plumbing tests: binary payload columns, Arrow-batched
metadata extraction (deterministic fake decode), feature vectors, and the
clearly-marked real-codec stub."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.multimodal import attach_payload, decode_meta, decode_real, extract_features


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").cache()


def test_decode_meta_matches_python(spark, docs):
    out = decode_meta(attach_payload(docs).select("doc_id", "payload"))
    assert out.columns == ["doc_id", "n_bytes", "width", "height", "channels", "checksum"]
    rows = out.join(docs, "doc_id").collect()
    for r in rows[:100]:
        n = len(r["text"].encode("utf-8"))
        assert r["n_bytes"] == n
        assert r["width"] == n % 640 + 1
        assert r["height"] == n * 7 % 480 + 1
        assert r["channels"] == n % 3 + 1
        first8 = r["text"].encode("utf-8")[:8].ljust(8, b"\0")
        assert r["checksum"] == int.from_bytes(first8, "little") & ((1 << 63) - 1)


def test_extract_features_shape_and_determinism(spark, docs):
    out = extract_features(attach_payload(docs).select("doc_id", "payload"), dim=16)
    rows = out.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    for r in rows[:50]:
        s = sum(r["features"])
        assert s == pytest.approx(1.0, abs=1e-5) or s == 0.0
    again = {r["doc_id"]: r["features"] for r in out.collect()}
    assert all(again[r["doc_id"]] == r["features"] for r in rows)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="not installed|not implemented"):
        decode_real(b"\x89PNG fake")


def test_binary_column_type(spark, docs):
    df = attach_payload(docs)
    assert dict(df.dtypes)["payload"] == "binary"

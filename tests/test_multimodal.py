"""Multimodal plumbing tests: binary payload columns, Arrow-batched
metadata extraction (deterministic fake decode), feature vectors, and the
clearly-marked real-codec stub."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.multimodal import (
    attach_payload,
    decode_meta,
    decode_real,
    extract_features,
    frame_sample,
    resize_fit,
)


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


def test_frame_sample_offsets_and_bytes(spark, docs):
    """Frames are the exact byte windows at the deterministic offsets."""
    out = frame_sample(
        attach_payload(docs).select("doc_id", "payload"), n_frames=4, frame_len=32,
        keep=["doc_id"],
    )
    texts = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
    rows = out.collect()
    assert len(rows) == 4 * len(texts)
    for r in rows[:200]:
        b = texts[r["doc_id"]]
        off = r["frame_idx"] * max(len(b) - 32, 0) // 3
        assert r["frame_off"] == off
        assert bytes(r["frame"]) == b[off : off + 32]


def test_resize_fit_integer_math(spark, docs):
    meta = decode_meta(attach_payload(docs).select("doc_id", "payload"), keep=["doc_id", "payload"])
    out = resize_fit(meta, keep=["doc_id", "width", "height"])
    texts = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
    for r in out.collect()[:200]:
        w, h = r["width"], r["height"]
        d = max(w, h)
        ew = max(1, w * 64 // d) if d > 64 else w
        eh = max(1, h * 64 // d) if d > 64 else h
        assert (r["out_w"], r["out_h"]) == (ew, eh)
        assert max(r["out_w"], r["out_h"]) <= 64
        n = len(texts[r["doc_id"]])
        stride = max(1, (w * h) // max(ew * eh, 1))
        assert bytes(r["resized"]) == texts[r["doc_id"]][::stride]
        assert r["resized_n_bytes"] == len(bytes(r["resized"])) == (n + stride - 1) // stride


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="not installed|not implemented"):
        decode_real(b"\x89PNG fake")


def test_binary_column_type(spark, docs):
    df = attach_payload(docs)
    assert dict(df.dtypes)["payload"] == "binary"

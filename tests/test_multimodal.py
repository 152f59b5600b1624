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


# ---------------------------------------------------------- real BMP


def test_bmp_golden_vector():
    """Hand-checkable 3x2 BGR image through build_bmp -> decode_bmp: the
    builder emits a spec-layout BMP (54-byte header, 4-byte row stride,
    bottom row first) and the decoder recovers the image-space stats."""
    import struct

    import numpy as np

    from sketchlib.multimodal import build_bmp, decode_bmp

    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)  # rows 0..8 / 9..17
    blob = build_bmp(px)
    # header facts straight off the bytes
    assert blob[:2] == b"BM"
    off = struct.unpack_from("<I", blob, 10)[0]
    assert off == 54
    w, h, planes, bpp = struct.unpack_from("<iiHH", blob, 18)
    assert (w, h, planes, bpp) == (3, 2, 1, 24)
    stride = 12  # 3*3=9 padded to 4-byte boundary
    assert len(blob) == off + stride * 2
    # bottom-up: the FILE's first pixel row is image row 1 (bytes 9..17)
    assert blob[off : off + 9] == bytes(range(9, 18))
    d = decode_bmp(blob)
    assert d == {
        "width": 3, "height": 2,
        "sum_b": int(px[:, :, 0].sum()), "sum_g": int(px[:, :, 1].sum()),
        "sum_r": int(px[:, :, 2].sum()), "top_row_sum": int(px[0].sum()),
    }


def test_bmp_top_down_variant_and_flip_detection():
    """A negative-height (top-down) BMP decodes with NO flip; flipping
    matters: for the same pixel bytes the two orientations must disagree
    on top_row_sum whenever h > 1."""
    import struct

    import numpy as np

    from sketchlib.multimodal import build_bmp, decode_bmp

    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    blob = bytearray(build_bmp(px))
    struct.pack_into("<i", blob, 22, -2)  # biHeight = -2: top-down
    d = decode_bmp(bytes(blob))
    assert d["height"] == 2
    # file row 0 (image row 1 of the bottom-up build) is now image row 0
    assert d["top_row_sum"] == int(px[1].sum())
    assert d["top_row_sum"] != decode_bmp(build_bmp(px))["top_row_sum"]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XX" + b[2:], "bad magic"),
        (lambda b: b[:40], "truncated header"),
        (lambda b: b[:-8], "truncated"),
        (lambda b: _patch(b, 28, "<H", 32), "unsupported"),   # bpp=32
        (lambda b: _patch(b, 30, "<I", 1), "unsupported"),    # BI_RLE8
        (lambda b: _patch(b, 18, "<i", 0), "bad dimensions"),  # w=0
        # off=0 would decode the header itself as pixels if accepted
        (lambda b: _patch(b, 10, "<I", 0), "bad pixel offset"),
        (lambda b: _patch(b, 26, "<H", 3), "bad info header"),  # planes
    ],
)
def test_bmp_malformed_rejects(mutate, msg):
    import numpy as np

    from sketchlib.multimodal import BmpError, build_bmp, decode_bmp

    blob = build_bmp(np.zeros((2, 3, 3), dtype=np.uint8))
    with pytest.raises(BmpError, match=msg):
        decode_bmp(mutate(blob))


def _patch(b: bytes, off: int, fmt: str, val: int) -> bytes:
    import struct

    out = bytearray(b)
    struct.pack_into(fmt, out, off, val)
    return bytes(out)


def test_bmp_df_quarantines_malformed(spark, docs):
    from sketchlib.multimodal import attach_bmp_payload, bmp_dims, decode_bmp_df

    payloads = attach_bmp_payload(
        docs.where("doc_id IS NOT NULL"), corrupt_every=3
    )
    out = decode_bmp_df(payloads, payload_col="bmp")
    rows = out.collect()
    assert rows, "no BMP rows decoded"
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        if r["doc_id"] % 3 == 0:
            assert r["bmp_ok"] is False and r["width"] is None
            assert r["sum_b"] is None and r["top_row_sum"] is None
        else:
            assert r["bmp_ok"] is True
            t = texts[r["doc_id"]].encode("utf-8")
            w, h = bmp_dims(len(t))
            assert (r["width"], r["height"]) == (w, h)
            total = sum(t[k % len(t)] for k in range(w * h * 3))
            assert r["sum_b"] + r["sum_g"] + r["sum_r"] == total
            assert r["top_row_sum"] == sum(t[k % len(t)] for k in range(3 * w))


def test_wav_golden_vector_and_chunk_walk():
    """Hand-checkable samples through build_wav -> decode_wav, with and
    without the junk LIST chunk between fmt and data: a decoder that
    assumes data at offset 44 instead of walking chunks fails the LIST
    variant."""
    import struct

    import numpy as np

    from sketchlib.multimodal import build_wav, decode_wav

    s = np.array([0, 1, -1, 32512, -32768, 7], dtype=np.int16)
    want = {
        "sample_rate": 22050, "n_samples": 6,
        "sum_s": int(s.astype(np.int64).sum()),
        "energy": int((s.astype(np.int64) ** 2).sum()),
        "peak": 32768,  # |−32768| in int64 — an int16 abs would overflow
    }
    plain = build_wav(s, 22050)
    assert plain[:4] == b"RIFF" and plain[8:12] == b"WAVE"
    assert struct.unpack_from("<I", plain, 4)[0] == len(plain) - 8
    assert decode_wav(plain) == want
    with_junk = build_wav(s, 22050, junk_chunk=True)
    assert b"LIST" in with_junk and len(with_junk) > len(plain)
    assert decode_wav(with_junk) == want
    # data is NOT at the canonical offset in the junk variant
    assert plain[36:40] == b"data" and with_junk[36:40] != b"data"


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"XXXX" + b[4:], "bad RIFF/WAVE magic"),
        (lambda b: b[:10], "bad RIFF/WAVE magic"),
        (lambda b: b[:-2], "truncated chunk"),
        (lambda b: _patch(b, 20, "<H", 85), "unsupported fmt"),   # IEEE float
        (lambda b: _patch(b, 22, "<H", 2), "unsupported fmt"),    # stereo
        (lambda b: _patch(b, 34, "<H", 8), "unsupported fmt"),    # 8-bit
        (lambda b: b[:12], "missing fmt/data chunk"),
    ],
)
def test_wav_malformed_rejects(mutate, msg):
    import numpy as np

    from sketchlib.multimodal import WavError, build_wav, decode_wav

    blob = build_wav(np.zeros(4, dtype=np.int16), 8000)
    with pytest.raises(WavError, match=msg):
        decode_wav(mutate(blob))


def test_wav_df_quarantines_malformed(spark, docs):
    from sketchlib.multimodal import attach_wav_payload, decode_wav_df, wav_rate

    payloads = attach_wav_payload(
        docs.where("doc_id IS NOT NULL"), corrupt_every=3
    )
    out = decode_wav_df(payloads, payload_col="wav")
    rows = out.collect()
    assert rows, "no WAV rows decoded"
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        if r["doc_id"] % 3 == 0:
            assert r["wav_ok"] is False and r["sample_rate"] is None
            assert r["sum_s"] is None and r["energy"] is None
        else:
            assert r["wav_ok"] is True
            t = texts[r["doc_id"]].encode("utf-8")
            assert r["sample_rate"] == wav_rate(len(t))
            assert r["n_samples"] == len(t)
            assert r["sum_s"] == 256 * sum(b - 128 for b in t)
            assert r["energy"] == 65536 * sum((b - 128) ** 2 for b in t)
            assert r["peak"] == 256 * max(abs(b - 128) for b in t)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    text=st.binary(min_size=1, max_size=200),
    cut=st.integers(min_value=0, max_value=300),
    patch_at=st.integers(min_value=0, max_value=120),
    patch_val=st.integers(min_value=0, max_value=255),
)
def test_bmp_decoder_total_on_mutations(text, cut, patch_at, patch_val):
    """Robustness property: ANY truncation/byte-patch of a real BMP either
    decodes to integer stats or raises BmpError — never any other
    exception (the quarantine path in decode_bmp_df catches BmpError
    only, so an unexpected exception class would kill a 100 TB stage)."""
    import numpy as np

    from sketchlib.multimodal import BmpError, bmp_dims, build_bmp, decode_bmp

    t = np.frombuffer(text, dtype=np.uint8)
    w, h = bmp_dims(len(t))
    k = np.arange(h * w * 3, dtype=np.int64)
    blob = bytearray(build_bmp(t[k % len(t)].reshape(h, w, 3)))
    if patch_at < len(blob):
        blob[patch_at] = patch_val
    blob = bytes(blob[: max(0, len(blob) - cut)])
    try:
        d = decode_bmp(blob)
        assert d["width"] > 0 and d["height"] > 0
        assert all(isinstance(v, int) for v in d.values())
    except BmpError:
        pass


@settings(max_examples=200, deadline=None)
@given(
    text=st.binary(min_size=1, max_size=200),
    cut=st.integers(min_value=0, max_value=300),
    patch_at=st.integers(min_value=0, max_value=120),
    patch_val=st.integers(min_value=0, max_value=255),
    junk=st.booleans(),
)
def test_wav_decoder_total_on_mutations(text, cut, patch_at, patch_val, junk):
    """Same totality property for the WAV chunk walker: mutated RIFF
    payloads decode or raise WavError, nothing else."""
    import numpy as np

    from sketchlib.multimodal import WavError, build_wav, decode_wav, wav_rate

    t = np.frombuffer(text, dtype=np.uint8)
    samples = ((t.astype(np.int64) - 128) * 256).astype(np.int16)
    blob = bytearray(build_wav(samples, wav_rate(len(t)), junk_chunk=junk))
    if patch_at < len(blob):
        blob[patch_at] = patch_val
    blob = bytes(blob[: max(0, len(blob) - cut)])
    try:
        d = decode_wav(blob)
        assert d["n_samples"] >= 0 and d["sample_rate"] >= 0
        assert all(isinstance(v, int) for v in d.values())
    except WavError:
        pass

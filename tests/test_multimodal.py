"""Unit tests for the multimodal mapInPandas kernels (no Spark session:
the kernels are plain batch-iterator functions, tested at the pandas
level exactly as executors run them)."""

import hashlib

import pandas as pd
import pytest

from pdf_ocr_spark.operators.multimodal import (
    IMG_FORMATS,
    decode_batches,
    decode_image_real,
    fake_decode,
    feature_batches,
)


def _blob(text: str) -> bytes:
    return hashlib.md5(text.encode()).digest()


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_fake_decode_deterministic_and_bounded():
    b = _blob("hello")
    assert fake_decode(b) == fake_decode(b)
    w, h, fmt = fake_decode(b)
    assert 16 <= w < 1936 and 16 <= h < 1096
    assert fmt in IMG_FORMATS


def test_decode_batches_one_row_per_input_across_batches():
    batches = [
        pd.DataFrame({"doc_id": [1, 2], "media_blob": [_blob("a"), _blob("b")]}),
        pd.DataFrame({"doc_id": [3], "media_blob": [_blob("c")]}),
    ]
    out = list(decode_batches(iter(batches)))
    assert len(out) == 2  # batch shape preserved (streamed, not concat)
    all_rows = pd.concat(out)
    assert list(all_rows.columns) == [
        "doc_id", "width", "height", "format", "n_bytes",
    ]
    assert list(all_rows["doc_id"]) == [1, 2, 3]
    assert (all_rows["n_bytes"] == 16).all()


def test_feature_mean_byte_matches_manual_sum():
    b = _blob("xyz")
    out = pd.concat(
        feature_batches(iter([pd.DataFrame({"doc_id": [7], "media_blob": [b]})]))
    )
    assert out["mean_byte"].iloc[0] == sum(b) / len(b)


def test_registry_is_consistent():
    from pdf_ocr_spark.queries import ALL_ORACLES, ALL_QUERIES

    assert set(ALL_ORACLES) <= set(ALL_QUERIES)
    # every new training-data operator family is registered
    for prefix in ("d0", "s0", "t0", "m0"):
        assert any(k.startswith(prefix) for k in ALL_QUERIES), prefix


def test_resize_plan_integer_math_and_noop():
    from pdf_ocr_spark.operators.multimodal import resize_plan

    assert resize_plan(100, 50, 256) == (100, 50)        # already fits
    assert resize_plan(256, 256, 256) == (256, 256)      # boundary no-op
    assert resize_plan(512, 256, 256) == (256, 128)      # exact halving
    assert resize_plan(1920, 1080, 256) == (256, 144)    # floor, long side w
    assert resize_plan(300, 1000, 256) == (76, 256)      # long side h
    # long side always lands exactly on max_side when shrinking
    for w, h in [(257, 17), (1000, 999), (123, 4567)]:
        nw, nh = resize_plan(w, h, 256)
        assert max(nw, nh) == 256 and nw <= w and nh <= h


def test_resize_batches_blob_roundtrip_and_schema():
    from pdf_ocr_spark.operators.multimodal import (
        fake_decode,
        resize_batches,
        resize_plan,
    )

    blobs = [_blob("a"), _blob("bb"), _blob("ccc")]
    out = pd.concat(
        resize_batches(256)(
            iter(
                [pd.DataFrame({"doc_id": [1, 2, 3], "media_blob": blobs})]
            )
        )
    )
    assert list(out.columns) == [
        "doc_id", "width", "height", "new_width", "new_height",
        "media_out", "n_bytes",
    ]
    for i, b in enumerate(blobs):
        w, h, _ = fake_decode(b)
        nw, nh = resize_plan(w, h, 256)
        row = out.iloc[i]
        assert (row["width"], row["height"]) == (w, h)
        assert (row["new_width"], row["new_height"]) == (nw, nh)
        assert bytes(row["media_out"]) == b  # stub passthrough, intact


def test_m06_scene_segmentation_reference(spark, tmp_path):
    """m06: luma fake, boundary threshold, and running shot id match a
    hashlib reference over the sampled frame stream."""
    import hashlib

    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "en"],
            "text": ["x" * 7, "y" * 250],  # durations 8 s and 11 s
            "n_chars": [7, 250],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    from pdf_ocr_spark.queries.multimodal_q import (
        _SCENE_TH,
        _SHOT_FRAMES,
        QUERIES,
    )

    rows = sorted(
        QUERIES["m06_scene_segments"](spark, str(tmp_path)).collect(),
        key=lambda r: (r["doc_id"], r["frame_idx"]),
    )

    def luma(doc_id, frame_idx):
        key = f"{doc_id}#{frame_idx // _SHOT_FRAMES}"
        return int(hashlib.md5(key.encode()).hexdigest()[:2], 16)

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    for doc_id, rs in by_doc.items():
        dur = (7 if doc_id == 1 else 250) % 120 + 1
        assert [r["frame_idx"] for r in rs] == list(
            range(0, dur * 30, 15)
        )
        prev, shots = None, 0
        for r in rs:
            lu = luma(doc_id, r["frame_idx"])
            assert r["luma"] == lu
            exp_b = prev is not None and abs(lu - prev) >= _SCENE_TH
            assert r["is_boundary"] == exp_b, (doc_id, r["frame_idx"])
            shots += int(exp_b)
            assert r["shot_id"] == shots
            prev = lu

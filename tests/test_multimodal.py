"""Multimodal plumbing tests: binary payload columns through mapInPandas
(decode kernel stubbed — FIXTURES.md: codec libs not bundled)."""

from __future__ import annotations

import pytest

from mimranalytics_core_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes([10, 20, 30, 40]), ("image/png", 640, 480)),
        (2, "image", bytes([200, 1, 2, 100]), ("image/jpeg", 120, 80)),
        (3, "audio", bytes(range(16)), ("audio/wav", 0, 0)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batches(media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_bytes == 4
    assert out[1].checksum != out[2].checksum
    assert 64 <= out[1].feat_width < 128


def test_resize_plan_no_decode(media):
    plans = {r.media_id: r for r in resize_plan(media, max_dim=256).collect()}
    assert plans[1].needs_resize and plans[1].target_w == 256
    assert plans[1].target_h == 192  # aspect preserved
    assert not plans[2].needs_resize


def test_export_report_roundtrip(spark, tmp_path, media):
    from mimranalytics_core_spark.sources.io import export_report, read_any

    feats = extract_features(media)
    dest = str(tmp_path / "report")
    export_report(feats, dest, fmt="parquet", order_by=["media_id"])
    back = read_any(spark, dest, "parquet")
    assert back.count() == 3
    assert sorted(back.columns) == sorted(feats.columns)

    dest_csv = str(tmp_path / "report_csv")
    export_report(feats, dest_csv, fmt="csv", single_file=True)
    back_csv = read_any(spark, dest_csv, "csv")
    assert back_csv.count() == 3


def test_frame_sample_expansion_shape(spark, media):
    """1→k expansion: exactly k frames per media row, offsets evenly spaced
    and within the payload, deterministic across runs."""
    import hashlib

    from mimranalytics_core_spark.functions.multimodal import frame_sample

    frames = frame_sample(media, k=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(by_media) == set(payloads)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r.frame_idx)
        dur = len(payloads[mid])
        assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
        assert [r.ts_off for r in rows] == [i * dur // 4 for i in range(4)]
        for r in rows:
            expect = hashlib.md5(payloads[mid][r.ts_off : r.ts_off + 16]).hexdigest()
            assert r.frame_sig == expect
    again = frame_sample(media, k=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, frames))

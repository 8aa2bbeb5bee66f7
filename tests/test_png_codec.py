"""Pure-Python PNG codec (multimodal._decode_png/_encode_png): the
stdlib-zlib inflate + unfilter reader must invert the encoder byte-for-
byte across ALL five scanline filter types, reject the PNG flavors the
reader honestly does not support, and the registered mm_decode_png query
must hash-match the same byte-level oracle as the PPM decode path.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_service_spark.operators import multimodal as mm  # noqa: E402


def _raster(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_all_filter_types():
    # h=10 cycles y % 5 twice: None/Sub/Up/Average/Paeth each hit twice
    raster = _raster(10, 16)
    w, h, maxval, out = mm.decode_image(mm._encode_png(raster))
    assert (w, h, maxval) == (16, 10, 255)
    assert out.tobytes() == raster.tobytes()


def test_roundtrip_extreme_bytes():
    # all-0 / all-255 / alternating rasters stress the mod-256 unfilter
    for fill in (np.zeros((7, 5, 3), np.uint8),
                 np.full((7, 5, 3), 255, np.uint8),
                 (np.indices((7, 5, 3)).sum(axis=0) % 256).astype(np.uint8)):
        _, _, _, out = mm.decode_image(mm._encode_png(fill))
        assert out.tobytes() == fill.tobytes()


def test_single_pixel_and_single_row():
    for shape in ((1, 1, 3), (1, 9, 3), (9, 1, 3)):
        raster = _raster(*shape[:2])
        _, _, _, out = mm.decode_image(mm._encode_png(raster))
        assert out.tobytes() == raster.tobytes()


def _chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _scanlines(px: np.ndarray, filters: list[int], bpp: int = 1) -> bytes:
    """Filter the (h, stride) byte matrix with the given per-row filter
    types (independent reimplementation of the spec, generic over
    bytes-per-pixel, so the reader is tested against the math rather
    than against its own encoder)."""
    h, stride = px.shape
    raw = bytearray()
    zeros = np.zeros(bpp, dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = px[y].astype(np.int64)
        left = np.concatenate([zeros, row[:-bpp]])
        upleft = np.concatenate([zeros, prev[:-bpp]])
        ft = filters[y % len(filters)]
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = (row - left) % 256
        elif ft == 2:
            filt = (row - prev) % 256
        elif ft == 3:
            filt = (row - (left + prev) // 2) % 256
        else:
            filt = (row - mm._paeth(left, prev, upleft)) % 256
        raw.append(ft)
        raw += filt.astype(np.uint8).tobytes()
        prev = row
    return bytes(raw)


def test_grayscale_png_decodes_replicated():
    import struct
    import zlib

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(10, 6), dtype=np.uint8)
    raw = _scanlines(px, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 6, 10, 8, 0, 0, 0, 0)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, maxval, out = mm.decode_image(blob)
    assert (w, h, maxval) == (6, 10, 255)
    expected = np.repeat(px.reshape(10, 6, 1), 3, axis=2)
    assert out.tobytes() == expected.tobytes()


def test_palette_png_decodes_via_plte():
    import struct
    import zlib

    rng = np.random.RandomState(5)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(10, 7), dtype=np.uint8)
    raw = _scanlines(idx, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 7, 10, 8, 3, 0, 0, 0)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, maxval, out = mm.decode_image(blob)
    assert (w, h, maxval) == (7, 10, 255)
    assert out.tobytes() == palette[idx].tobytes()


def test_palette_index_out_of_range_raises():
    import struct
    import zlib

    palette = np.zeros((4, 3), dtype=np.uint8)  # indices 0..3 valid
    idx = np.full((2, 2), 9, dtype=np.uint8)
    raw = _scanlines(idx, [0])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_image(blob)


def test_unsupported_png_flavor_raises():
    import struct

    # 16-bit depth and interlaced stay honestly gated
    for bit_depth, color_type, interlace in ((16, 2, 0), (8, 2, 1)):
        ihdr = struct.pack(
            ">IIBBBBB", 2, 2, bit_depth, color_type, 0, 0, interlace
        )
        blob = mm._PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            mm.decode_image(blob)


def test_rgba_png_drops_alpha():
    import struct
    import zlib

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(9, 5, 4), dtype=np.uint8)
    raw = _scanlines(px.reshape(9, 20), [0, 1, 2, 3, 4], bpp=4)
    ihdr = struct.pack(">IIBBBBB", 5, 9, 8, 6, 0, 0, 0)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, maxv, out = mm._decode_png(blob)
    assert (w, h, maxv) == (5, 9, 255)
    assert out.tobytes() == px[:, :, :3].tobytes()


def test_gray_alpha_png_replicates_and_drops_alpha():
    import struct
    import zlib

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(7, 4, 2), dtype=np.uint8)
    raw = _scanlines(px.reshape(7, 8), [4, 3, 2, 1, 0], bpp=2)
    ihdr = struct.pack(">IIBBBBB", 4, 7, 8, 4, 0, 0, 0)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, maxv, out = mm._decode_png(blob)
    assert (w, h, maxv) == (4, 7, 255)
    expect = np.repeat(px[:, :, :1], 3, axis=2)
    assert out.tobytes() == expect.tobytes()


def test_truncated_idat_raises():
    raster = _raster(4, 4)
    blob = bytearray(mm._encode_png(raster))
    # shrink the IDAT length field's payload by lopping off the end
    with pytest.raises(Exception):
        mm._decode_png(bytes(blob[:60]))


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="testdata absent"
)
def test_mm_decode_png_matches_oracle(spark):
    import duckdb

    from tests.oracle_harness import compare

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    sdf = mm.mm_decode_png(spark, sf)
    odf = con.execute(mm.mm_decode_sql()).fetchdf()
    assert compare(sdf, odf) == []

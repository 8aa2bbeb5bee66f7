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


def test_illegal_ihdr_combinations_raise():
    import struct

    # spec-ILLEGAL combinations are rejected as invalid, not gated:
    # 16-bit palette, sub-byte RGB, unknown color type, bogus interlace
    for w, h, bit_depth, color_type, interlace in (
        (2, 2, 16, 3, 0), (2, 2, 4, 2, 0), (2, 2, 8, 5, 0), (2, 2, 8, 2, 7),
    ):
        ihdr = struct.pack(
            ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace
        )
        blob = mm._PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            mm.decode_image(blob)


def test_jpeg_stays_gated():
    with pytest.raises(NotImplementedError, match="JPEG"):
        mm.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


# ---- round-10 flavors: 16-bit, sub-byte, Adam7 ------------------------
# All fixture bytes below are built with INDEPENDENT reimplementations
# of the spec (big-endian sample serialization, MSB-first bit packing,
# the Adam7 origin/step table), never with the reader's own helpers.

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _be16_rows(samples: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint16 -> (h, w*ch*2) big-endian byte rows."""
    h = samples.shape[0]
    flat = samples.reshape(h, -1).astype(np.uint16)
    hi, lo = (flat >> 8).astype(np.uint8), (flat & 0xFF).astype(np.uint8)
    return np.stack([hi, lo], axis=2).reshape(h, -1)


def _pack_rows(values: np.ndarray, bit_depth: int) -> np.ndarray:
    """(h, w) small ints -> (h, ceil(w*d/8)) byte rows, MSB-first."""
    h, w = values.shape
    stride = (w * bit_depth + 7) // 8
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        acc, nbits, pos = 0, 0, 0
        for x in range(w):
            acc = (acc << bit_depth) | int(values[y, x])
            nbits += bit_depth
            while nbits >= 8:
                out[y, pos] = (acc >> (nbits - 8)) & 0xFF
                nbits -= 8
                pos += 1
        if nbits:
            out[y, pos] = (acc << (8 - nbits)) & 0xFF
    return out


def _png(w, h, bit_depth, color_type, interlace, idat, plte=None) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    blob = mm._PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        blob += _chunk(b"PLTE", plte)
    return blob + _chunk(b"IDAT", zlib.compress(idat)) + _chunk(b"IEND", b"")


def _interlace(samples: np.ndarray, to_rows, filters, bpp) -> bytes:
    """Adam7-split (h, w[, ch]) samples, serialize each pass with
    to_rows, filter each pass independently, concatenate."""
    hgt, wid = samples.shape[0], samples.shape[1]
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        pw = (wid - x0 + dx - 1) // dx
        ph = (hgt - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        raw += _scanlines(to_rows(samples[y0::dy, x0::dx]), filters, bpp=bpp)
    return raw


def test_16bit_rgb_png_maps_high_byte():
    rng = np.random.RandomState(13)
    px16 = rng.randint(0, 65536, size=(9, 5, 3)).astype(np.uint16)
    raw = _scanlines(_be16_rows(px16), [0, 1, 2, 3, 4], bpp=6)
    w, h, maxv, out = mm._decode_png(_png(5, 9, 16, 2, 0, raw))
    assert (w, h, maxv) == (5, 9, 255)
    assert out.tobytes() == (px16 >> 8).astype(np.uint8).tobytes()


def test_16bit_gray_png():
    rng = np.random.RandomState(17)
    px16 = rng.randint(0, 65536, size=(7, 6, 1)).astype(np.uint16)
    raw = _scanlines(_be16_rows(px16), [4, 3, 2, 1, 0], bpp=2)
    _, _, _, out = mm._decode_png(_png(6, 7, 16, 0, 0, raw))
    expect = np.repeat((px16 >> 8).astype(np.uint8), 3, axis=2)
    assert out.tobytes() == expect.tobytes()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_png_scales_exactly(depth):
    rng = np.random.RandomState(19 + depth)
    # width NOT a multiple of 8/depth: exercises row-end bit padding
    vals = rng.randint(0, 1 << depth, size=(6, 11)).astype(np.uint8)
    raw = _scanlines(_pack_rows(vals, depth), [0, 1, 2, 3, 4], bpp=1)
    _, _, _, out = mm._decode_png(_png(11, 6, depth, 0, 0, raw))
    scaled = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
    expect = np.repeat(scaled.reshape(6, 11, 1), 3, axis=2)
    assert out.tobytes() == expect.tobytes()


def test_subbyte_palette_png():
    rng = np.random.RandomState(23)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(5, 9)).astype(np.uint8)
    raw = _scanlines(_pack_rows(idx, 4), [0, 1, 2, 3, 4], bpp=1)
    _, _, _, out = mm._decode_png(
        _png(9, 5, 4, 3, 0, raw, plte=palette.tobytes())
    )
    assert out.tobytes() == palette[idx].tobytes()


@pytest.mark.parametrize("shape", [(10, 9), (8, 8), (3, 3), (1, 1), (2, 16)])
def test_adam7_rgb_png(shape):
    h, w = shape
    rng = np.random.RandomState(29 + h * 31 + w)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    raw = _interlace(
        px, lambda s: s.reshape(s.shape[0], -1), [0, 1, 2, 3, 4], bpp=3
    )
    ww, hh, maxv, out = mm._decode_png(_png(w, h, 8, 2, 1, raw))
    assert (ww, hh, maxv) == (w, h, 255)
    assert out.tobytes() == px.tobytes()


def test_adam7_16bit_gray_png():
    rng = np.random.RandomState(37)
    px16 = rng.randint(0, 65536, size=(9, 10, 1)).astype(np.uint16)
    raw = _interlace(px16, _be16_rows, [2, 4, 0, 1, 3], bpp=2)
    _, _, _, out = mm._decode_png(_png(10, 9, 16, 0, 1, raw))
    expect = np.repeat((px16 >> 8).astype(np.uint8), 3, axis=2)
    assert out.tobytes() == expect.tobytes()


def test_adam7_subbyte_palette_png():
    rng = np.random.RandomState(41)
    palette = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(11, 7)).astype(np.uint8)
    raw = _interlace(idx, lambda s: _pack_rows(s, 2), [3, 1, 4, 0, 2], bpp=1)
    _, _, _, out = mm._decode_png(
        _png(7, 11, 2, 3, 1, raw, plte=palette.tobytes())
    )
    assert out.tobytes() == palette[idx].tobytes()


def test_adam7_truncated_payload_raises():
    px = _raster(8, 8)
    raw = _interlace(
        px, lambda s: s.reshape(s.shape[0], -1), [0], bpp=3
    )
    with pytest.raises(ValueError):
        mm._decode_png(_png(8, 8, 8, 2, 1, raw[:-5]))


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


def test_adam7_table_partitions_the_grid():
    """Every pixel of an 8x8 tile (and any larger grid) must be covered
    by EXACTLY one pass — the property that makes the scatter a
    bijection. This caught a wrong y-origin during round 10."""
    grid = np.zeros((16, 16), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        grid[y0::dy, x0::dx] += 1
    assert (grid == 1).all()


def test_encode_png_deep_roundtrips():
    """The deep encoder (Adam7 + 16-bit, samples v*257) must decode
    back to the source raster byte-for-byte via the high-byte map."""
    for shape in ((10, 16), (3, 3), (1, 1), (7, 9)):
        raster = _raster(*shape, seed=43 + shape[0])
        w, h, maxv, out = mm.decode_image(mm._encode_png_deep(raster))
        assert (w, h, maxv) == (shape[1], shape[0], 255)
        assert out.tobytes() == raster.tobytes()


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="testdata absent"
)
def test_mm_decode_png_deep_matches_oracle(spark):
    import duckdb

    from tests.oracle_harness import compare

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    sdf = mm.mm_decode_png_deep(spark, sf)
    odf = con.execute(mm.mm_decode_sql()).fetchdf()
    assert not compare(sdf, odf)

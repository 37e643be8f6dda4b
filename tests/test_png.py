"""PNG decoder unit tests (VERDICT r13 ask #1) — the decode path is
checked against HAND-COMPUTED spec vectors (filtered bytes written as
literals, reconstruction worked out by hand from the PNG spec §9), not
just against our own encoder, so a symmetric encode/decode bug cannot
self-cancel.  Round-trip, CRC verification, multi-IDAT concatenation,
truncation, and the out-of-scope shapes are covered too."""

from __future__ import annotations

import zlib

import pytest

from json_to_parquet_spark.operators.media import (

    PNG_SIG,
    decode_image_pixels,
    decode_png,
    encode_png,
    image_alpha,
    image_dims,
    image_rgb,
    make_image,
    make_image_rgba,
    _png_chunk,
)

# driver-window profile (pytest.ini): decode-heavy — release gate runs it via -m ""
pytestmark = pytest.mark.slow


def _build_png(w: int, h: int, filtered: bytes, color_type: int = 2) -> bytes:
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes((8, color_type, 0, 0, 0))
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(filtered))
        + _png_chunk(b"IEND", b"")
    )


def test_hand_computed_sub_paeth_average_vectors():
    """2×3 RGB image, rows filtered Sub/Paeth/Average; the expected
    reconstruction below is worked out by hand from the spec."""
    filtered = (
        b"\x01" + bytes([10, 20, 30, 5, 5, 5])
        + b"\x04" + bytes([1, 2, 3, 4, 5, 6])
        + b"\x03" + bytes([2, 2, 2, 2, 2, 2])
    )
    w, h, c, pix, filters = decode_png(_build_png(2, 3, filtered))
    assert (w, h, c) == (2, 3, 3)
    assert filters == [1, 4, 3]
    assert list(pix) == [
        10, 20, 30, 15, 25, 35,   # Sub: right pixel += left pixel
        11, 22, 33, 19, 30, 41,   # Paeth: predictors b,b,b / b,b,b
        7, 13, 18, 15, 23, 31,    # Average: (left + up) >> 1
    ]


def test_hand_computed_up_and_none_vectors():
    filtered = (
        b"\x00" + bytes([1, 2, 3, 250, 251, 252])
        + b"\x02" + bytes([10, 10, 10, 10, 10, 10])
    )
    _w, _h, _c, pix, filters = decode_png(_build_png(2, 2, filtered))
    assert filters == [0, 2]
    # Up adds the previous row byte-wise mod 256 (250+10 wraps to 4).
    assert list(pix) == [1, 2, 3, 250, 251, 252, 11, 12, 13, 4, 5, 6]


@pytest.mark.parametrize("doc_id", [0, 7, 58, 123, 4096])
def test_fixture_roundtrip_rgb(doc_id):
    w, h = image_dims(doc_id)
    rw, rh, c, pix, filters = decode_png(make_image(doc_id, "png"))
    assert (rw, rh, c) == (w, h, 3)
    assert pix == image_rgb(doc_id, w, h)
    # Encoder filter law: row y uses filter y % 5.
    assert filters == [y % 5 for y in range(h)]


def test_all_five_filters_exercised_on_tall_fixture():
    # h = doc_id % 7 + 3; doc_id 4 → h = 7 ≥ 5: all filter types appear.
    _w, _h, _c, _pix, filters = decode_png(make_image(4, "png"))
    assert set(filters) >= {0, 1, 2, 3, 4}


@pytest.mark.parametrize("doc_id", [3, 19, 200])
def test_fixture_roundtrip_rgba(doc_id):
    w, h = image_dims(doc_id)
    rw, rh, c, pix, _f = decode_png(make_image_rgba(doc_id))
    assert (rw, rh, c) == (w, h, 4)
    rgb = image_rgb(doc_id, w, h)
    alpha = image_alpha(doc_id, w, h)
    for p in range(w * h):
        assert pix[4 * p : 4 * p + 3] == rgb[3 * p : 3 * p + 3]
        assert pix[4 * p + 3] == alpha[p]


def test_decode_image_pixels_dispatches_png_and_strips_alpha():
    d = 42
    w, h = image_dims(d)
    assert decode_image_pixels(make_image(d, "png")) == (
        w, h, 3, image_rgb(d, w, h),
    )
    # RGBA: alpha plane dropped, RGB identical to the opaque twin.
    assert decode_image_pixels(make_image_rgba(d)) == (
        w, h, 3, image_rgb(d, w, h),
    )
    # And the three formats agree pixel-exactly.
    assert (
        decode_image_pixels(make_image(d, "png"))
        == decode_image_pixels(make_image(d, "ppm"))
        == decode_image_pixels(make_image(d, "bmp"))
    )


def test_multi_idat_concatenation():
    """IDAT data may be split at ANY byte boundary across chunks."""
    w, h = image_dims(9)
    png = make_image(9, "png")
    # Rebuild with the compressed stream split into 3-byte IDAT chunks.
    pos = 8
    ihdr = idat = None
    while pos < len(png):
        clen = int.from_bytes(png[pos : pos + 4], "big")
        ctype = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat = data
        pos += 12 + clen
    split = b"".join(
        _png_chunk(b"IDAT", idat[i : i + 3]) for i in range(0, len(idat), 3)
    )
    rebuilt = (
        PNG_SIG + _png_chunk(b"IHDR", ihdr) + split + _png_chunk(b"IEND", b"")
    )
    assert decode_png(rebuilt) == decode_png(png)


def test_crc_mismatch_raises():
    png = bytearray(make_image(5, "png"))
    # Flip a byte inside the IDAT payload without fixing its CRC.
    idat_at = bytes(png).index(b"IDAT")
    png[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(png))


def test_truncated_and_corrupt_streams_raise():
    png = make_image(5, "png")
    with pytest.raises(ValueError):
        decode_png(png[:-5])  # IEND chopped
    # Valid chunk structure, undersized inflate output.
    w, h = image_dims(5)
    short = zlib.compress(b"\x00" + bytes(3 * w))  # one row only
    bad = (
        PNG_SIG
        + _png_chunk(
            b"IHDR",
            w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes((8, 2, 0, 0, 0)),
        )
        + _png_chunk(b"IDAT", short)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(bad)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a")


def test_out_of_scope_shapes_raise_notimplemented():
    w, h = 2, 2
    base = w.to_bytes(4, "big") + h.to_bytes(4, "big")
    for tail in (
        bytes((8, 2, 0, 0, 1)),  # interlaced
        bytes((16, 2, 0, 0, 0)),  # 16-bit
        bytes((8, 4, 0, 0, 0)),  # gray+alpha (not in scope)
        bytes((1, 3, 0, 0, 0)),  # sub-8-bit palette
    ):
        png = (
            PNG_SIG
            + _png_chunk(b"IHDR", base + tail)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_png(png)


def test_invalid_filter_type_raises():
    with pytest.raises(ValueError, match="invalid PNG filter type"):
        decode_png(_build_png(1, 1, b"\x07" + bytes(3)))


def test_encoder_rejects_bad_args():
    with pytest.raises(ValueError):
        encode_png(2, 2, bytes(12), channels=5)
    with pytest.raises(ValueError):
        encode_png(2, 2, bytes(11), channels=3)


@pytest.mark.parametrize("doc_id", [0, 6, 77])
def test_grayscale_roundtrip_expands_to_rgb(doc_id):
    from json_to_parquet_spark.operators.media import (
        image_gray,
        make_image_gray,
    )

    w, h = image_dims(doc_id)
    rw, rh, c, pix, filters = decode_png(make_image_gray(doc_id))
    assert (rw, rh, c) == (w, h, 3)
    gray = image_gray(doc_id, w, h)
    assert pix == bytes(v for g in gray for v in (g, g, g))
    assert filters == [y % 5 for y in range(h)]


@pytest.mark.parametrize("doc_id", [1, 23, 140])
def test_palette_roundtrip_resolves_lut(doc_id):
    from json_to_parquet_spark.operators.media import (
        image_pal_indices,
        image_palette,
        make_image_pal,
    )

    w, h = image_dims(doc_id)
    rw, rh, c, pix, filters = decode_png(make_image_pal(doc_id))
    assert (rw, rh, c) == (w, h, 3)
    pal = image_palette(doc_id)
    idx = image_pal_indices(doc_id, w, h)
    assert pix == b"".join(pal[3 * i : 3 * i + 3] for i in idx)
    # Filtering runs over INDEX bytes (the spec), still the y%5 law.
    assert filters == [y % 5 for y in range(h)]


def test_palette_missing_plte_and_bad_index_raise():
    import zlib as _z

    from json_to_parquet_spark.operators.media import (
        _png_filter_stream,
        make_image_pal,
    )

    # Strip the PLTE chunk from a valid palette PNG.
    png = make_image_pal(1)
    pos = 8
    keep = [png[:8]]
    while pos < len(png):
        clen = int.from_bytes(png[pos : pos + 4], "big")
        ctype = png[pos + 4 : pos + 8]
        if ctype != b"PLTE":
            keep.append(png[pos : pos + 12 + clen])
        pos += 12 + clen
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(b"".join(keep))
    # An index beyond the palette must be rejected at decode.
    pal = bytes(6)  # 2 entries
    idat = _z.compress(_png_filter_stream(2, 1, bytes([0, 5]), 1))
    bad = (
        PNG_SIG
        + _png_chunk(
            b"IHDR",
            (2).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes((8, 3, 0, 0, 0)),
        )
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index out of range"):
        decode_png(bad)


def test_gray_hand_computed_sub_filter():
    """1-byte filter unit: Sub's left neighbor is the PREVIOUS BYTE
    (bpp=1), hand-checked."""
    import zlib as _z

    filtered = b"\x01" + bytes([10, 5, 5])
    png = (
        PNG_SIG
        + _png_chunk(
            b"IHDR",
            (3).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes((8, 0, 0, 0, 0)),
        )
        + _png_chunk(b"IDAT", _z.compress(filtered))
        + _png_chunk(b"IEND", b"")
    )
    _w, _h, c, pix, _f = decode_png(png)
    assert c == 3
    # gray recon = [10, 15, 20] → RGB-expanded
    assert list(pix) == [10, 10, 10, 15, 15, 15, 20, 20, 20]

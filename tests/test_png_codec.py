"""Vendored PNG codec: round-trip through every filter type, grayscale
arithmetic, corrupt-input error codes, end-to-end through decode_media
and the thumbnail kernel, and PIL differential when available."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ragflow_spark.kernels.png import (
    SIGNATURE,
    decode_png,
    decode_png_gray,
    encode_png,
    to_gray,
)


def _gray_img(h=13, w=17, seed=5):
    return ((seed * 37 + np.arange(h * w)) % 251).astype(np.uint8).reshape(h, w)


def _rgb_img(h=9, w=11, seed=3):
    return (
        ((seed * 41 + np.arange(h * w * 3)) % 253).astype(np.uint8).reshape(h, w, 3)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_gray_round_trip_every_filter(ftype):
    img = _gray_img()
    data = encode_png(img, filter_type=ftype)
    assert data[:8] == SIGNATURE
    out = decode_png(data)
    assert out.shape == (13, 17, 1)
    np.testing.assert_array_equal(out[:, :, 0], img)
    np.testing.assert_array_equal(decode_png_gray(data), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_round_trip_every_filter(ftype):
    img = _rgb_img()
    out = decode_png(encode_png(img, filter_type=ftype))
    np.testing.assert_array_equal(out, img)


def test_gray_conversion_matches_pil_coefficients():
    img = _rgb_img()
    g = to_gray(decode_png(encode_png(img)))
    v = img.astype(np.uint32)
    want = (
        (v[:, :, 0] * 19595 + v[:, :, 1] * 38470 + v[:, :, 2] * 7471 + 0x8000)
        >> 16
    ).astype(np.uint8)
    np.testing.assert_array_equal(g, want)


def test_single_pixel_and_single_row():
    one = np.array([[200]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png_gray(encode_png(one, 4)), one)
    row = _gray_img(1, 40)
    np.testing.assert_array_equal(decode_png_gray(encode_png(row, 1)), row)


def test_ancillary_chunks_skipped():
    img = _gray_img(4, 4)
    data = encode_png(img)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    body = b"comment\x00hi"
    crc = zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF
    text = struct.pack(">I", len(body)) + b"tEXt" + body + struct.pack(">I", crc)
    spliced = data[:ihdr_end] + text + data[ihdr_end:]
    np.testing.assert_array_equal(decode_png_gray(spliced), img)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[:-20],  # truncated (loses IDAT tail/IEND)
        lambda d: d[:8] + d[20:],  # missing IHDR
        lambda d: d.replace(b"IDAT", b"IDAX", 1),  # no image data
        # interlace byte (last of IHDR body, offset 8+8+12) flipped to Adam7
        lambda d: d[:28] + b"\x01" + d[29:],
        # corrupt the deflate stream inside IDAT
        lambda d: d[: d.index(b"IDAT") + 8] + b"\xff\xff" + d[d.index(b"IDAT") + 10 :],
    ],
)
def test_corrupt_inputs_raise_valueerror(mutate):
    data = encode_png(_gray_img(6, 6))
    with pytest.raises(ValueError):
        decode_png(mutate(data))


def test_decode_media_real_png_path():
    """A real PNG payload through decode_media: media_type 'png',
    DECODE_OK, pixels identical, and the thumbnail kernel consumes the
    decoded array — the real-codec branch now executes in-sandbox."""
    from ragflow_spark.kernels.media import DECODE_OK, decode_media, thumbnail_2x

    img = _gray_img(12, 16)
    m = decode_media(encode_png(img, filter_type=4))
    assert (m.media_type, m.decode_code) == ("png", DECODE_OK)
    assert (m.width, m.height) == (16, 12)
    np.testing.assert_array_equal(m.payload, img)
    th = thumbnail_2x(m.payload)
    assert th.shape == (6, 8)
    assert th[0, 0] == (
        int(img[0, 0]) + int(img[0, 1]) + int(img[1, 0]) + int(img[1, 1])
    ) // 4


def test_pil_differential_if_available():
    """When pillow IS installed the two codec paths must agree byte
    for byte (skipped in the sandbox, runs in pillow-equipped CI)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    for img in (_gray_img(), None):
        rgb = _rgb_img()
        data = encode_png(rgb if img is None else img)
        with PIL_Image.open(io.BytesIO(data)) as im:
            want = np.asarray(im.convert("L"), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png_gray(data), want)

"""Media kernel unit tests (pure numpy, no Spark) + stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_spark.kernels.media import (
    DECODE_EMPTY,
    DECODE_OK,
    DECODE_REAL_CODEC_UNAVAILABLE,
    DECODE_TRUNCATED,
    DECODE_UNKNOWN_FORMAT,
    decode_media,
    decode_real_image,
    encode_media,
    media_params_for,
    sample_frames,
    thumbnail_2x,
)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 35, 996, 997, 12345])
def test_encode_decode_roundtrip(doc_id):
    m = decode_media(encode_media(doc_id))
    p = media_params_for(doc_id)
    assert m.decode_code == DECODE_OK
    assert m.media_type == p["kind"]
    if p["kind"] == "image":
        assert (m.width, m.height) == (p["width"], p["height"])
        assert m.payload.shape == (p["height"], p["width"])
    elif p["kind"] == "video":
        assert m.n_frames == p["n_frames"]
        assert m.payload.shape == (p["n_frames"], p["height"], p["width"])
    else:
        assert m.n_samples == p["n_samples"]
        assert m.payload.shape == (p["n_samples"],)


def test_determinism():
    assert encode_media(42) == encode_media(42)


def test_error_as_row_codes():
    assert decode_media(None).decode_code == DECODE_EMPTY
    assert decode_media(b"").decode_code == DECODE_EMPTY
    assert decode_media(b"garbage!").decode_code == DECODE_UNKNOWN_FORMAT
    truncated = encode_media(0)[:-5]
    assert decode_media(truncated).decode_code == DECODE_TRUNCATED
    # corrupt PNG through the vendored real decoder -> coded row
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    m = decode_media(png)
    assert m.media_type == "png"
    assert m.decode_code == DECODE_TRUNCATED
    # formats with no vendored decoder -> codec-unavailable row
    jpg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    m2 = decode_media(jpg)
    assert m2.media_type == "jpeg"
    assert m2.decode_code == DECODE_REAL_CODEC_UNAVAILABLE


def test_real_decode_stubbed_only_beyond_png():
    # PNG is vendored now (r3 verdict #7); JPEG still needs pillow
    with pytest.raises(NotImplementedError):
        decode_real_image(b"\xff\xd8\xff\xe0" + b"\x00" * 8)


def test_thumbnail_block_mean():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    th = thumbnail_2x(img)
    assert th.shape == (2, 2)
    # block (0,0) = mean(0,1,4,5) floor = 2
    assert th[0, 0] == 2
    assert th[1, 1] == (10 + 11 + 14 + 15) // 4
    # odd dims: trailing row/col dropped
    odd = np.ones((5, 3), dtype=np.uint8)
    assert thumbnail_2x(odd).shape == (2, 1)
    tiny = np.ones((1, 1), dtype=np.uint8)
    assert thumbnail_2x(tiny).shape == (1, 1)


def test_sample_frames():
    vid = np.arange(7 * 2 * 2, dtype=np.uint8).reshape(7, 2, 2)
    s = sample_frames(vid, every=3)
    assert s.shape[0] == 3  # frames 0, 3, 6
    assert (s[0] == vid[0]).all() and (s[2] == vid[6]).all()


# ------------------------------------------- real-codec path selection


def _png_stub_payload() -> bytes:
    return b"\x89PNG\r\n\x1a\n" + b"\x00" * 16


def test_real_codec_absent_degrades_to_coded_row():
    """No PIL in this container: a real-format magic with no vendored
    decoder must yield a DECODE_REAL_CODEC_UNAVAILABLE coded row,
    never an exception."""
    from ragflow_spark.kernels import media

    assert media._load_pil() is None  # the sandbox truly lacks PIL
    d = media.decode_media(b"GIF89a" + b"\x00" * 10)
    assert d.media_type == "gif"
    assert d.decode_code == media.DECODE_REAL_CODEC_UNAVAILABLE


def test_real_codec_present_decodes(monkeypatch):
    """With a codec library resolved, the same payload takes the real
    decode path and returns DECODE_OK pixels (PIL is stubbed — the
    selection logic, shape contract and error handling are what's
    under test)."""
    import contextlib

    import numpy as np

    from ragflow_spark.kernels import media

    class _Img:
        def convert(self, mode):
            assert mode == "L"
            return np.arange(12, dtype=np.uint8).reshape(3, 4)

    class _ImageMod:
        @staticmethod
        def open(fp):
            if fp.read(4) != b"\x89PNG":
                raise OSError("not a png")
            fp.seek(0)
            return contextlib.nullcontext(_Img())

    monkeypatch.setattr(media, "_load_pil", lambda: _ImageMod)
    d = media.decode_media(_png_stub_payload())
    assert (d.media_type, d.decode_code) == ("png", media.DECODE_OK)
    assert (d.width, d.height) == (4, 3)
    assert d.payload.shape == (3, 4)
    # corrupt bytes through a real codec -> coded row, not an exception
    bad = media.decode_media(b"\xff\xd8\xff" + b"zz")
    assert bad.decode_code in (
        media.DECODE_TRUNCATED,
        media.DECODE_REAL_CODEC_UNAVAILABLE,
    )

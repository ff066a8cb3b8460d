"""In-repo production-decoder registration example (VERDICT r11 ask #7).

The media ops' decoder contract (ext/media.py module docstring) was
previously exercised only by synthetic test decoders. This module ships
a REAL pure-numpy decoder for two trivial container formats — binary
PPM/PGM images (netpbm P6/P5) and PCM WAV audio (RIFF/WAVE) — so the
registration path decodes actual bytes end to end with zero external
dependencies:

    from pandas_ta_spark.ext.decoders import numpy_decoder
    from pandas_ta_spark.ext.media import set_decoder
    set_decoder(numpy_decoder)   # BEFORE building the media query

Shape contract (media.py): image -> (H, W) or (H, W, 3) uint8;
audio -> (n_samples,) mono or (channels, n_samples); video -> frame
axis 0 (a decoded still image is returned as a 1-frame video).
Undecodable payloads raise ValueError (per-row degrade, never abort).

In a real deployment this module is where PIL/libsndfile/ffmpeg would
plug in; PPM/WAV are chosen because their containers are simple enough
to parse with numpy alone, which keeps the example runnable in this
dependency-free container.
"""

from __future__ import annotations

import numpy as np


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P6 (RGB) -> (H, W, 3) uint8, P5 (gray) -> (H, W).

    Parses the standard header — magic, then width/height/maxval tokens
    separated by whitespace with '#' comments — followed by raw samples.
    Only maxval <= 255 (1 byte per sample) is supported."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload (no P6/P5 magic)")
    rgb = payload[:2] == b"P6"

    # header tokenizer: whitespace-separated ints, '#'-to-EOL comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos:pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad PPM header token {tok!r}")
            tokens.append(int(tok))
            pos = end
    w, h, maxval = tokens
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM maxval {maxval} (1-byte only)")
    pos += 1  # exactly one whitespace byte separates header from raster
    ch = 3 if rgb else 1
    need = w * h * ch
    raster = payload[pos:pos + need]
    if len(raster) < need:
        raise ValueError(f"PPM raster truncated: {len(raster)} < {need}")
    a = np.frombuffer(raster, dtype=np.uint8)
    return a.reshape(h, w, 3) if rgb else a.reshape(h, w)


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM RIFF/WAVE: mono -> (n_samples,), multi -> (channels, n).

    Walks the RIFF chunk list (fmt / data; unknown chunks skipped, as
    the spec requires), supports PCM (format tag 1) at 8 bits (uint8)
    or 16 bits (little-endian int16)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits == 8:
        a = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        a = np.frombuffer(data, dtype="<i2")
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if channels <= 0:
        raise ValueError("WAV channels must be positive")
    if channels == 1:
        return a
    n = len(a) // channels
    # WAV interleaves channels per sample frame -> (channels, n_samples)
    return a[: n * channels].reshape(n, channels).T


def numpy_decoder(payload: bytes, kind: str) -> np.ndarray:
    """The registration example: magic-byte dispatch over the formats
    this module can actually decode, honoring the media-op kind contract
    (video requests get the frame axis; a still image is a 1-frame
    video). Anything else is undecodable -> ValueError (per-row degrade,
    media.py failure semantics)."""
    if payload[:2] in (b"P6", b"P5"):
        if kind == "audio":
            # an (H, W) matrix handed to audio ops would be silently
            # read as (channels, n_samples) — shape-contract misuse,
            # so mismatched container class degrades per-row instead
            raise ValueError("payload is a netpbm image, not audio")
        img = decode_ppm(payload)
        return img[None, ...] if kind == "video" else img
    if payload[:4] == b"RIFF":
        if kind != "audio":
            raise ValueError("payload is RIFF/WAVE audio, not "
                             f"{kind} (no frame axis to synthesize)")
        return decode_wav(payload)
    raise ValueError(
        f"numpy_decoder cannot decode this payload (magic "
        f"{payload[:4]!r}; supported: P6/P5 netpbm, RIFF/WAVE PCM)")

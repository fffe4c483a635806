"""Unit tests for the pure-stdlib media codecs (operators/codecs.py)
and the real-codec multimodal queries built on them.

The round-trip tests are the ground truth for the byte formats; the
query-level value checks live in the registry oracle (q_audio_features
/ q_image_decode / q_png_decode run under tests/test_oracle.py's
bitwise differential like every other query).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_round_trip():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    b = encode_wav(samples, 8000)
    nch, rate, out = decode_wav(b)
    assert (nch, rate) == (1, 8000)
    assert out == samples


def test_wav_chunk_walk_skips_extra_chunks():
    # A conforming writer may emit LIST/fact chunks between fmt and
    # data; the decoder must walk the chunk list, not assume offsets.
    samples = [5, -6, 7]
    b = bytearray(encode_wav(samples, 44100))
    # splice a LIST chunk (odd-sized body to exercise word alignment)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data_at = bytes(b).index(b"data")
    spliced = bytes(b[:data_at]) + extra + bytes(b[data_at:])
    # fix the RIFF size field
    spliced = (
        spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    )
    nch, rate, out = decode_wav(spliced)
    assert (nch, rate, out) == (1, 44100, samples)


def test_wav_rejects_non_pcm_and_non_16bit():
    b = bytearray(encode_wav([1, 2], 8000))
    fmt_at = bytes(b).index(b"fmt ")
    bad = bytes(b[: fmt_at + 8]) + struct.pack("<H", 3) + bytes(b[fmt_at + 10 :])
    with pytest.raises(NotImplementedError):
        decode_wav(bad)
    with pytest.raises(ValueError):
        decode_wav(b"JUNK" + bytes(b))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 4), (8, 8)])
def test_bmp_round_trip_row_padding(w, h):
    # widths 1/3/5 force non-zero 4-byte row padding
    rows = [
        [((x * 7 + y) % 256, (x + y * 11) % 256, (x * y) % 256) for x in range(w)]
        for y in range(h)
    ]
    b = encode_bmp(w, h, rows)
    w2, h2, out = decode_bmp(b)
    assert (w2, h2) == (w, h)
    assert out == rows
    # real row stride: 4-byte aligned
    assert (len(b) - 54) == ((3 * w + 3) & ~3) * h


def test_bmp_rejects_unsupported():
    b = bytearray(encode_bmp(2, 2, [[(0, 0, 0)] * 2] * 2))
    bad_bpp = bytes(b[:28]) + struct.pack("<H", 32) + bytes(b[30:])
    with pytest.raises(NotImplementedError):
        decode_bmp(bad_bpp)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + bytes(b[2:]))


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_round_trip_exercises_all_filters():
    # h >= 5 → rows carry filter types 0,1,2,3,4 (encoder uses y % 5)
    w, h = 13, 7
    rows = [[(3 * x + 5 * y + 11) % 256 for x in range(w)] for y in range(h)]
    b = encode_png(w, h, rows)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    w2, h2, out = decode_png(b)
    assert (w2, h2) == (w, h)
    assert out == rows


def test_png_crc_and_structure_are_real():
    # the IHDR chunk must carry a correct CRC32 — i.e., these are
    # conforming PNG bytes, not a lookalike container
    b = encode_png(4, 4, [[0, 255, 1, 254]] * 4)
    size = struct.unpack(">I", b[8:12])[0]
    ctype = b[12:16]
    body = b[16 : 16 + size]
    crc = struct.unpack(">I", b[16 + size : 20 + size])[0]
    assert ctype == b"IHDR"
    assert crc == (zlib.crc32(ctype + body) & 0xFFFFFFFF)


def test_png_rejects_unsupported():
    b = bytearray(encode_png(2, 2, [[1, 2], [3, 4]]))
    # flip the IHDR color-type byte and rebuild the chunk with a
    # recomputed CRC so the CRC gate doesn't fire before the
    # unsupported-format check.
    size = struct.unpack(">I", b[8:12])[0]
    body = bytearray(b[16 : 16 + size])
    body[9] = 2  # color type
    chunk = (
        struct.pack(">I", size)
        + b"IHDR"
        + bytes(body)
        + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
    )
    bad = bytes(b[:8]) + chunk + bytes(b[16 + size + 4 :])
    with pytest.raises(NotImplementedError):
        decode_png(bad)
    with pytest.raises(ValueError):
        decode_png(b"notapng")


def test_png_rejects_crc_mismatch():
    # a silently flipped pixel-data bit must fail loudly, not decode
    # to wrong values (the chunks carry CRC32 for exactly this)
    b = bytearray(encode_png(4, 4, [[9, 8, 7, 6]] * 4))
    idat_at = bytes(b).index(b"IDAT")
    b[idat_at + 6] ^= 0x01  # corrupt one IDAT payload byte
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))


def test_wav_rejects_truncated():
    b = encode_wav([1, 2, 3, 4], 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(b[:-3])


def test_bmp_rejects_truncated():
    b = encode_bmp(3, 3, [[(1, 2, 3)] * 3] * 3)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(b[:-5])


def test_png_multi_idat_decode():
    # IDAT may be split across chunks; decoder must concatenate
    w, h = 6, 6
    rows = [[(x * y) % 256 for x in range(w)] for y in range(h)]
    b = encode_png(w, h, rows)
    # split the single IDAT into two chunks
    pos = 8
    out = b[:8]
    while pos + 8 <= len(b):
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + size]
        if ctype == b"IDAT" and size > 1:
            half = size // 2
            for part in (body[:half], body[half:]):
                out += (
                    struct.pack(">I", len(part))
                    + b"IDAT"
                    + part
                    + struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
                )
        else:
            out += b[pos : pos + 12 + size]
        pos += 12 + size
    assert decode_png(out) == (w, h, rows)


# ---------------------------------------------------------------------------
# Property tests (hypothesis): round-trip identity over random content
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_property(samples, rate):
    nch, r, out = decode_wav(encode_wav(samples, rate))
    assert (nch, r, out) == (1, rate, samples)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 9), st.integers(1, 9), st.randoms(use_true_random=False))
def test_bmp_round_trip_property(w, h, rnd):
    rows = [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256)) for _ in range(w)]
        for _ in range(h)
    ]
    assert decode_bmp(encode_bmp(w, h, rows)) == (w, h, rows)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.randoms(use_true_random=False))
def test_png_round_trip_property(w, h, rnd):
    rows = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
    assert decode_png(encode_png(w, h, rows)) == (w, h, rows)


def test_gif_round_trip_exercises_lzw_width_growth_and_reset():
    # 120×90 random raster forces 9→10→11→12-bit code growth AND a
    # dictionary reset at 4096; constant raster forces KwKwK chains
    import random

    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_gif, encode_gif,
    )

    rng = random.Random(3)
    for w, h, rows in [
        (1, 1, [[7]]),
        (120, 90, [[rng.randrange(256) for _ in range(120)] for _ in range(90)]),
        (50, 40, [[9] * 50 for _ in range(40)]),
        (64, 64, [[(x * y) % 256 for x in range(64)] for y in range(64)]),
    ]:
        b = encode_gif(w, h, rows)
        assert b[:6] == b"GIF87a" and b[-1] == 0x3B
        assert decode_gif(b) == (w, h, rows)


def test_gif_decoder_reads_a_real_tool_written_file():
    # External conformance vector: plusnode.gif from CPython's
    # idlelib (PSF-licensed stdlib asset), written by a standard GIF
    # encoder — 89a header, extension block, real LZW stream.  Proves
    # the variable-width schedule matches tool-written files, not just
    # our own encoder.
    import base64

    from nfl26_bigdatabowl_prediction_spark.operators.codecs import decode_gif

    vec = base64.b64decode(
        "R0lGODlhCwALAPEDAP///39/fwAAAMDAwCH5BAUAAAMALAAAAAALAAsAAAIfnI8W"
        "y6wAIwgPikhHiBfmLYThVAEdqXFYKX1Nk8RDAQA7"
    )
    w, h, rows = decode_gif(vec)
    assert (w, h) == (11, 11)
    assert sum(v for r in rows for v in r) == 21944


def test_gif_rejects_unsupported():
    import pytest

    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_gif, encode_gif,
    )

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    b = bytearray(encode_gif(3, 3, [[0, 1, 2]] * 3))
    # image descriptor sits at 6 (header) + 7 (LSD) + 768 (palette);
    # flip its interlace bit (searching for 0x2C would false-match
    # the gray-44 palette entry)
    idx = 6 + 7 + 768
    assert b[idx] == 0x2C
    b[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(b))


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.randoms(use_true_random=False))
def test_gif_round_trip_property(w, h, rnd):
    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_gif, encode_gif,
    )

    rows = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
    assert decode_gif(encode_gif(w, h, rows)) == (w, h, rows)


def test_pgm_round_trip_both_formats():
    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_pgm, encode_pgm,
    )

    rows = [[(5 * x + 7 * y) % 256 for x in range(10)] for y in range(4)]
    for plain in (False, True):
        assert decode_pgm(encode_pgm(10, 4, rows, plain=plain)) == (10, 4, rows)


def test_pgm_parser_handles_comments_and_whitespace():
    from nfl26_bigdatabowl_prediction_spark.operators.codecs import decode_pgm

    # A hand-written conforming P2 file: comments between every header
    # token, mixed tabs/newlines between samples.
    b = b"P2 # magic comment\n# full line\n 3\t2 # dims\n255\n0 1\t2\n253  254\n255\n"
    assert decode_pgm(b) == (3, 2, [[0, 1, 2], [253, 254, 255]])


def test_pgm_rejects_unsupported():
    import pytest

    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_pgm, encode_pgm,
    )

    with pytest.raises(NotImplementedError):
        decode_pgm(b"P6\n1 1\n255\n\x00\x00\x00")  # PPM color
    with pytest.raises(NotImplementedError):
        decode_pgm(b"P5\n1 1\n65535\n\x00\x00")  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n4 4\n255\n\x00")  # truncated raster
    with pytest.raises(ValueError):
        encode_pgm(2, 2, [[0, 0]], plain=False)  # dim mismatch


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.booleans(),
       st.randoms(use_true_random=False))
def test_pgm_round_trip_property(w, h, plain, rnd):
    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_pgm, encode_pgm,
    )

    rows = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
    assert decode_pgm(encode_pgm(w, h, rows, plain=plain)) == (w, h, rows)


def test_qoi_round_trip_exercises_all_ops():
    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_qoi, encode_qoi,
    )

    # Gradient rows force DIFF/LUMA/RGB; constant rows force RUN (and
    # INDEX on revisits); a >62-run forces the run-length split.
    w, h = 70, 6
    rows = [
        [((7,) * 3) if y % 2 else ((2 * x + y) % 256, (3 * x) % 256, (5 * x) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    b = encode_qoi(w, h, rows)
    assert b[:4] == b"qoif" and b[-8:] == b"\x00" * 7 + b"\x01"
    assert decode_qoi(b) == (w, h, rows)


def test_qoi_rejects_unsupported():
    import pytest

    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_qoi, encode_qoi,
    )

    with pytest.raises(NotImplementedError):
        decode_qoi(b"nope" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_qoi(encode_qoi(2, 1, [[(1, 2, 3), (4, 5, 6)]])[:-10])  # truncated
    with pytest.raises(ValueError):
        encode_qoi(3, 1, [[(0, 0, 0)]])  # dim mismatch


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 10), st.integers(1, 10), st.randoms(use_true_random=False))
def test_qoi_round_trip_property(w, h, rnd):
    from nfl26_bigdatabowl_prediction_spark.operators.codecs import (
        decode_qoi, encode_qoi,
    )

    rows = [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
         if rnd.random() < 0.6 else (9, 9, 9)
         for _ in range(w)]
        for _ in range(h)
    ]
    assert decode_qoi(encode_qoi(w, h, rows)) == (w, h, rows)

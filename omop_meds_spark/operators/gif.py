"""Real pure-Python GIF87a codec — the multi-frame ("video analogue")
sibling of ``operators/png.py``, closing the frame-sampling stub with a
genuinely compressed format.

Everything on the read path is from scratch off the public GIF87a spec:

* **GIF-variant LZW** (``_lzw_decode``): variable code width starting at
  ``min_code_size + 1`` bits (LSB-first packing), CLEAR / END codes,
  dictionary growth to 4095 with the standard post-add width bump, the
  KwKwK (code == next_code) case, and full-table CLEAR handling. The
  encoder (``_lzw_encode``, synthetic payloads only) is the greedy
  longest-match builder with the mirrored width schedule — round-tripped
  in tests across random / repetitive / alternating inputs large enough
  to force 9→12-bit growth and forced clears.
* **GIF container**: header + logical screen descriptor + global color
  table, per-frame image descriptors (optional local color table,
  interlace rejected), sub-block de-blocking, extension skipping (so
  GIF89a streams parse too), trailer.

Scope: non-interlaced frames, no transparency semantics — pixel values
ARE the palette indices (the synthetic palette is the identity grayscale
ramp), which keeps every decoded aggregate recomputable from source text
by a SQL oracle. The Spark surface (``gif_from_documents`` /
``decode_gif`` / ``gif_frames``) lives in ``multimodal.py``.
"""

from __future__ import annotations

import struct

_MAX_CODE_BITS = 12


class _LZWBitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, code: int, size: int) -> None:
        self.bits.extend((code >> i) & 1 for i in range(size))

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW encode (synthetic payload production only)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    w = _LZWBitWriter()
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, code_size)
    prev = b""
    for ch in data:
        cand = prev + bytes([ch])
        if cand in table:
            prev = cand
            continue
        w.write(table[prev], code_size)
        if next_code < (1 << _MAX_CODE_BITS):
            table[cand] = next_code
            next_code += 1
            # width bump ONE step later than the local table suggests: the
            # decoder adds its matching entry only on the NEXT code it
            # receives, so its width changes lag the encoder's table by
            # one code (the canonical GIF "deferred change" schedule)
            if (next_code == (1 << code_size) + 1
                    and code_size < _MAX_CODE_BITS):
                code_size += 1
        else:  # table full: reset, mirroring the decoder's CLEAR handling
            w.write(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([ch])
    if prev:
        w.write(table[prev], code_size)
    w.write(end, code_size)
    return w.bytes()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decode, from scratch (see module docstring).

    >>> _lzw_decode(_lzw_encode(b'abcabcabca'), 8)
    b'abcabcabca'
    >>> _lzw_decode(_lzw_encode(bytes(500), 2), 2) == bytes(500)
    True
    """
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"lzw: bad min code size {min_code_size}")
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    pos = 0

    def read() -> int:
        nonlocal pos
        if pos + code_size > len(data) * 8:
            raise ValueError("lzw: truncated code stream")
        v = 0
        for i in range(code_size):
            v |= ((data[pos >> 3] >> (pos & 7)) & 1) << i
            pos += 1
        return v

    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read()
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"lzw: first code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << _MAX_CODE_BITS):
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < (1 << _MAX_CODE_BITS):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"lzw: code {code} beyond table ({len(table)})")
        if len(table) == (1 << code_size) and code_size < _MAX_CODE_BITS:
            code_size += 1
        out += entry
        prev = entry


def _subblocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def _gif_encode(frames: list[bytes], width: int, height: int) -> bytes:
    """Minimal canonical GIF87a writer: global 256-entry grayscale
    palette (identity ramp — pixel value == palette index), one image
    block per frame, LZW min code size 8.

    >>> _gif_encode([bytes([0, 1, 2, 3])], 2, 2)[:6]
    b'GIF87a'
    """
    for f in frames:
        if len(f) != width * height:
            raise ValueError("gif: frame buffer does not match dimensions")
    out = bytearray(b"GIF87a")
    # logical screen: global color table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += _GRAY_PALETTE
    for f in frames:
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([8]) + _subblocks(_lzw_encode(f, 8))
    out += b"\x3B"
    return bytes(out)


def _gif_decode(b: bytes) -> dict:
    """REAL pure-Python multi-frame GIF decode: header + screen
    descriptor, global color table, per-frame image descriptors with
    sub-block de-blocking and from-scratch LZW, extension skipping,
    trailer. Pixel counts are validated per frame.

    >>> d = _gif_decode(_gif_encode([bytes([5, 6]), bytes([7, 8])], 2, 1))
    >>> (d['width'], d['height'], d['n_frames'], d['checksum'], d['max_px'])
    (2, 1, 2, 26, 8)
    """
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(b) < 13:
        raise ValueError("gif: truncated screen descriptor")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames: list[bytes] = []
    while True:
        if pos >= len(b):
            raise ValueError("gif: missing trailer")
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(b):
                    raise ValueError("gif: truncated extension")
                n = b[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if marker != 0x2C:
            raise ValueError(f"gif: unknown block marker {marker:#x}")
        if pos + 9 > len(b):
            raise ValueError("gif: truncated image descriptor")
        _lx, _ly, fw, fh, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if iflags & 0x40:
            raise ValueError("gif: interlaced frames unsupported")
        if iflags & 0x80:  # local color table
            pos += 3 * (2 << (iflags & 0x07))
        if pos >= len(b):
            raise ValueError("gif: truncated LZW header")
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(b):
                raise ValueError("gif: truncated image sub-blocks")
            n = b[pos]
            pos += 1
            if n == 0:
                break
            chunk = b[pos:pos + n]
            if len(chunk) != n:
                raise ValueError("gif: truncated sub-block")
            data += chunk
            pos += n
        px = _lzw_decode(bytes(data), mcs)
        if len(px) != fw * fh:
            raise ValueError(
                f"gif: frame pixel count {len(px)} != {fw}x{fh}")
        frames.append(px)
    if not frames:
        raise ValueError("gif: no image frames")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "checksum": sum(sum(f) for f in frames),
        "max_px": max(max(f, default=0) for f in frames),
        "frames": frames,
    }

"""Minimal but REAL GIF89a codec — palette-indexed single-frame images
with a complete variable-width LZW implementation (clear/EOI codes, 12-bit
dictionary cap with mid-stream resets, LSB-first bit packing, 255-byte
sub-block framing). Pure stdlib+numpy like the sibling codecs
(pngmini/netpbm/wav): the environment has no image libraries, so the media
queries certify REAL byte-level decode work against closed-form SQL twins
(SURVEY.md §2.6 multimodal row; upstream: goose-parser's media spans carry
opaque binary payloads — this is the decode stage a production pipeline
runs in an actor pool).

Spec followed from the public GIF89a specification (CompuServe 1990):
header + logical screen descriptor + global color table + image
descriptor + LZW-compressed index stream + trailer. No interlace, no
transparency — the pipeline-relevant subset. The single-frame pair is
``encode_gif``/``decode_gif``; ``encode_gif_animated``/``decode_gif_frames``
add the multi-frame GIF89a animation subset (Graphic Control Extension
per frame with centisecond delays, NETSCAPE2.0 looping application
extension) — the in-repo "video" container that makes frame-sampling a
REAL decode stage rather than a stub.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_BITS = 12


def _bits_for(n: int) -> int:
    b = 1
    while (1 << b) < n:
        b += 1
    return b


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit reader over the concatenated sub-block payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("gif: LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW: emit CLEAR, then greedy longest-match against a growing
    dictionary; code width grows when the next free code would not fit,
    and at the 12-bit cap a CLEAR resets the table (the spec's required
    behavior for long streams)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    code_size = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    bw.write(clear, code_size)
    it = iter(int(x) for x in indices)
    try:
        cur = next(it)
    except StopIteration:
        bw.write(eoi, code_size)
        return bw.flush()
    for k in it:
        key = (cur, k)
        hit = table.get(key)
        if hit is not None:
            cur = hit
            continue
        bw.write(cur, code_size)
        table[key] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < _MAX_CODE_BITS:
            code_size += 1
        elif next_code > (1 << _MAX_CODE_BITS):
            bw.write(clear, code_size)
            table.clear()
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = k
    bw.write(cur, code_size)
    bw.write(eoi, code_size)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`lzw_encode` (and of any conforming GIF encoder):
    rebuilds the dictionary in lockstep, handles the KwKwK self-reference
    case, CLEAR resets, and the code-width growth schedule."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = np.empty(n_expected, np.uint8)
    n_out = 0
    code_size = min_code_size + 1
    prefix: list[int] = []
    # dictionary as (prev_code, appended_symbol, first_symbol, length)
    prev_of = np.zeros(1 << _MAX_CODE_BITS, np.int32)
    sym_of = np.zeros(1 << _MAX_CODE_BITS, np.uint8)
    first_of = np.zeros(1 << _MAX_CODE_BITS, np.uint8)
    len_of = np.zeros(1 << _MAX_CODE_BITS, np.int32)

    def reset() -> int:
        nonlocal code_size
        for c in range(clear):
            prev_of[c] = -1
            sym_of[c] = c
            first_of[c] = c
            len_of[c] = 1
        code_size = min_code_size + 1
        return eoi + 1

    def expand(code: int, at: int) -> None:
        ln = int(len_of[code])
        if at + ln > n_expected:
            raise ValueError("gif: LZW output exceeds declared pixel count")
        c = code
        for off in range(ln - 1, -1, -1):
            out[at + off] = sym_of[c]
            c = int(prev_of[c])

    next_code = reset()
    prev_code = -1
    while True:
        code = br.read(code_size)
        if code == clear:
            next_code = reset()
            prev_code = -1
            continue
        if code == eoi:
            break
        if prev_code < 0:
            if code >= clear:
                raise ValueError("gif: first code after clear not a literal")
            expand(code, n_out)
            n_out += 1
            prev_code = code
            continue
        if code < next_code and code != eoi:
            expand(code, n_out)
            n_out += int(len_of[code])
            first = int(first_of[code])
        elif code == next_code:
            # KwKwK: new entry = prev + first(prev)
            first = int(first_of[prev_code])
            expand(prev_code, n_out)
            ln = int(len_of[prev_code])
            if n_out + ln + 1 > n_expected:
                raise ValueError("gif: LZW output exceeds declared pixel count")
            out[n_out + ln] = first
            n_out += ln + 1
        else:
            raise ValueError("gif: LZW code beyond dictionary")
        if next_code < (1 << _MAX_CODE_BITS):
            prev_of[next_code] = prev_code
            sym_of[next_code] = first
            first_of[next_code] = int(first_of[prev_code])
            len_of[next_code] = len_of[prev_code] + 1
            next_code += 1
            # EARLY CHANGE: the decoder's table is one entry behind the
            # encoder's (the encoder adds after EMITTING code #n, the
            # decoder after READING it, and read #1 adds nothing), so the
            # decoder must widen one code sooner — when next_code REACHES
            # 2^cs, matching the encoder's "grow when next_code exceeds
            # 2^cs" exactly one emitted code later.
            if (
                next_code >= (1 << code_size)
                and code_size < _MAX_CODE_BITS
            ):
                code_size += 1
        prev_code = code
    if n_out != n_expected:
        raise ValueError(
            f"gif: decoded {n_out} pixels, expected {n_expected}"
        )
    return out


def encode_gif(
    width: int,
    height: int,
    palette: np.ndarray,
    indices: np.ndarray,
) -> bytes:
    """GIF89a bytes for one palette-indexed frame. ``palette`` is
    (P, 3) uint8 with P ≤ 256; ``indices`` is height×width uint8 < P."""
    palette = np.asarray(palette, np.uint8)
    indices = np.asarray(indices, np.uint8).reshape(-1)
    p = len(palette)
    if not 2 <= p <= 256:
        raise ValueError("gif: palette size must be in [2, 256]")
    if indices.size != width * height:
        raise ValueError("gif: index count != width*height")
    if int(indices.max(initial=0)) >= p:
        raise ValueError("gif: index beyond palette")
    gct_bits = max(1, _bits_for(p))
    gct_n = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((gct_bits - 1) & 7) | (7 << 4))
    out += b"\x00\x00"
    gct = np.zeros((gct_n, 3), np.uint8)
    gct[:p] = palette
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    mcs = max(2, gct_bits)
    out.append(mcs)
    payload = lzw_encode(indices, mcs)
    for i in range(0, len(payload), 255):
        blk = payload[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes):
    """Parse GIF89a/87a and return (width, height, palette(P,3) uint8,
    indices height×width uint8). Raises ValueError on any malformed
    structure — the mutation-fuzz contract (raise-or-correct, never
    garbage)."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: bad signature")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        gct_n = 1 << ((packed & 7) + 1)
        end = pos + 3 * gct_n
        if end > len(data):
            raise ValueError("gif: truncated color table")
        palette = np.frombuffer(data[pos:end], np.uint8).reshape(-1, 3)
        pos = end
    while True:
        if pos >= len(data):
            raise ValueError("gif: missing trailer")
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:
            raise ValueError("gif: no image block")
        if b0 == 0x21:  # extension: label + sub-blocks, skip
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("gif: truncated extension blocks")
                ln = data[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b0 == 0x2C:
            break
        raise ValueError(f"gif: unknown block 0x{b0:02x}")
    if pos + 9 > len(data):
        raise ValueError("gif: truncated image descriptor")
    left, top, w, h = struct.unpack_from("<HHHH", data, pos)
    ipacked = data[pos + 8]
    pos += 9
    if ipacked & 0x40:
        raise ValueError("gif: interlace unsupported")
    if ipacked & 0x80:
        lct_n = 1 << ((ipacked & 7) + 1)
        end = pos + 3 * lct_n
        if end > len(data):
            raise ValueError("gif: truncated local color table")
        palette = np.frombuffer(data[pos:end], np.uint8).reshape(-1, 3)
        pos = end
    if palette is None:
        raise ValueError("gif: no color table")
    if w == 0 or h == 0 or w * h > 1 << 26:
        raise ValueError("gif: bad dimensions")
    if pos >= len(data):
        raise ValueError("gif: missing LZW min code size")
    mcs = data[pos]
    pos += 1
    if not 2 <= mcs <= 11:
        raise ValueError("gif: bad LZW min code size")
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        if pos + ln > len(data):
            raise ValueError("gif: truncated sub-block payload")
        chunks.append(data[pos : pos + ln])
        pos += ln
    idx = lzw_decode(b"".join(chunks), mcs, w * h)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("gif: index beyond palette")
    return w, h, palette, idx.reshape(h, w)


def encode_gif_animated(
    width: int,
    height: int,
    palette: np.ndarray,
    frames: "list[np.ndarray]",
    delays_cs: "list[int] | None" = None,
    loop: int = 0,
) -> bytes:
    """GIF89a bytes for an ANIMATION: one global color table, a
    NETSCAPE2.0 looping application extension, then per frame a Graphic
    Control Extension (delay in centiseconds) + full-screen image
    descriptor + LZW index stream. ``frames`` is a list of height×width
    uint8 index rasters (< len(palette)); ``delays_cs`` defaults to 10 cs
    per frame. ``loop=0`` means loop forever (the spec's convention)."""
    palette = np.asarray(palette, np.uint8)
    p = len(palette)
    if not 2 <= p <= 256:
        raise ValueError("gif: palette size must be in [2, 256]")
    if not frames:
        raise ValueError("gif: animation needs at least one frame")
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("gif: delays/frames length mismatch")
    gct_bits = max(1, _bits_for(p))
    gct_n = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((gct_bits - 1) & 7) | (7 << 4))
    out += b"\x00\x00"
    gct = np.zeros((gct_n, 3), np.uint8)
    gct[:p] = palette
    out += gct.tobytes()
    # NETSCAPE2.0 application extension: loop count (0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
    out += struct.pack("<H", int(loop) & 0xFFFF)
    out += b"\x00"
    mcs = max(2, gct_bits)
    for fr, delay in zip(frames, delays_cs):
        idx = np.asarray(fr, np.uint8).reshape(-1)
        if idx.size != width * height:
            raise ValueError("gif: frame index count != width*height")
        if int(idx.max(initial=0)) >= p:
            raise ValueError("gif: frame index beyond palette")
        # Graphic Control Extension: no disposal, no transparency
        out += b"\x21\xf9\x04\x00"
        out += struct.pack("<H", int(delay) & 0xFFFF)
        out += b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(mcs)
        payload = lzw_encode(idx, mcs)
        for i in range(0, len(payload), 255):
            blk = payload[i : i + 255]
            out.append(len(blk))
            out += blk
        out += b"\x00"  # sub-block terminator for this frame's image data
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes):
    """Parse a (possibly animated) GIF89a/87a and return
    ``(width, height, palette, frames, delays_cs)`` where ``frames`` is a
    list of height×width uint8 rasters and ``delays_cs`` the per-frame
    Graphic Control delays (0 when a frame carries no GCE). Full-screen
    frames only (left=top=0, frame dims == screen dims) — the subset
    ``encode_gif_animated`` emits. Raises ValueError on any malformed
    structure (the mutation-fuzz contract: raise-or-correct, never
    garbage)."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: bad signature")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        gct_n = 1 << ((packed & 7) + 1)
        end = pos + 3 * gct_n
        if end > len(data):
            raise ValueError("gif: truncated color table")
        palette = np.frombuffer(data[pos:end], np.uint8).reshape(-1, 3)
        pos = end
    if palette is None:
        raise ValueError("gif: no global color table")
    if sw == 0 or sh == 0 or sw * sh > 1 << 26:
        raise ValueError("gif: bad dimensions")
    frames: "list[np.ndarray]" = []
    delays: "list[int]" = []
    pending_delay = 0
    while True:
        if pos >= len(data):
            raise ValueError("gif: missing trailer")
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:
            break
        if b0 == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                if pos + 6 > len(data) or data[pos] != 4:
                    raise ValueError("gif: bad graphic control block")
                pending_delay = struct.unpack_from("<H", data, pos + 2)[0]
                pos += 5
                if data[pos] != 0:
                    raise ValueError("gif: unterminated graphic control")
                pos += 1
            else:  # skip sub-blocks (application/comment/plain-text)
                while True:
                    if pos >= len(data):
                        raise ValueError("gif: truncated extension blocks")
                    ln = data[pos]
                    pos += 1 + ln
                    if ln == 0:
                        break
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unknown block 0x{b0:02x}")
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise ValueError("gif: interlace unsupported")
        if ipacked & 0x80:
            raise ValueError("gif: local color table unsupported in frames")
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError("gif: partial-screen frame unsupported")
        if pos >= len(data):
            raise ValueError("gif: missing LZW min code size")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("gif: bad LZW min code size")
        chunks = []
        while True:
            if pos >= len(data):
                raise ValueError("gif: truncated sub-blocks")
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(data):
                raise ValueError("gif: truncated sub-block payload")
            chunks.append(data[pos : pos + ln])
            pos += ln
        idx = lzw_decode(b"".join(chunks), mcs, w * h)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("gif: index beyond palette")
        frames.append(idx.reshape(h, w))
        delays.append(pending_delay)
        pending_delay = 0
    if not frames:
        raise ValueError("gif: no image block")
    return sw, sh, palette, frames, delays

"""Pure-stdlib GIF87a codec — real LZW compression, no codec libraries.

The third real image codec next to BMP (struct) and PNG (zlib) in
operators/multimodal.py, and like them it exists because the container has
no PIL/ffmpeg: GIF's only non-trivial layer is LZW, which is ~60 lines of
integer bookkeeping (Welch 1984; GIF89a spec appendix F — both public).

Encoder: palette-indexed (the synthesized 16×16 tiles have ≤256 distinct
colors by pigeonhole — 256 pixels), genuine variable-width LZW with
dictionary growth 9→12 bits and a clear-code reset at 4096 entries, codes
packed LSB-first into ≤255-byte sub-blocks.

Decoder: full GIF LZW — handles clear/EOI, the first-code-after-clear
special case, the KwKwK self-referencing code, width growth at table-size
boundaries, and multi-sub-block data streams; output indices are mapped
through the global color table back to an (H, W, 3) uint8 array.

Scale posture: both functions are per-payload kernels invoked inside
Arrow-batched ``mapInPandas`` (operators/multimodal.py) — bytes never
enter a Python row loop at the DataFrame layer, and the work parallelizes
per partition like any projection.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIG = b"GIF87a"


def _pack_codes(codes, min_code_size: int) -> bytes:
    """LSB-first variable-width code packing with GIF's width schedule:
    width starts at min_code_size+1 and must mirror the DECODER's table
    state, growing after the code that makes the table reach 2^width, and
    resetting on clear."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    next_code = clear + 2
    first_after_clear = True
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # replay the DECODER's table bookkeeping to stay in lockstep: the
        # decoder adds no entry for the first data code after a clear (it
        # has no previous string yet), so it sits one entry behind the
        # encoder — bumping the width on the encoder's own count would
        # switch one code too early and desynchronize the bit stream
        if code == clear:
            width = min_code_size + 1
            next_code = clear + 2
            first_after_clear = True
        elif code != eoi:
            if first_after_clear:
                first_after_clear = False
            elif next_code < 4096:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Genuine LZW: longest-match dictionary compression, not the
    uncompressed-GIF literal trick."""
    clear = 1 << min_code_size
    eoi = clear + 1
    codes = [clear]
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for k in indices:
        wk = w + bytes([int(k)])
        if wk in table:
            w = wk
            continue
        codes.append(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            # table full: reset, exactly like every mainstream encoder
            codes.append(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        w = bytes([int(k)])
    if w:
        codes.append(table[w])
    codes.append(eoi)
    return _pack_codes(codes, min_code_size)


def encode_gif(pixels) -> bytes:
    """(H, W, 3) uint8 array → a genuine GIF87a file (global color table,
    real LZW image data). Requires ≤256 distinct colors."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(colors)}")
    # pad the palette to a power of two (spec: table size is 2^(n+1))
    gct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    palette = np.zeros((1 << gct_bits, 3), np.uint8)
    palette[: len(colors)] = colors
    min_code_size = max(2, gct_bits)

    out = bytearray(_GIF_SIG)
    # logical screen descriptor: GCT present, size 2^(gct_bits)
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 0x07), 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(min_code_size)
    data = _lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes):
    """GIF87a/89a → (H, W, 3) uint8. Full LZW decode; supports the subset
    the encoder above and common single-image files use (global color
    table, no interlace, no transparency). Malformed/truncated payloads
    raise ValueError like every sibling decoder."""
    try:
        return _decode_gif(data)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"truncated or corrupt GIF: {ex}") from ex


def _decode_gif(data: bytes):
    if data[:3] != b"GIF":
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    if not packed & 0x80:
        raise ValueError("no global color table")
    gct_len = 2 << (packed & 0x07)
    palette = np.frombuffer(data[pos : pos + 3 * gct_len], np.uint8).reshape(
        gct_len, 3
    )
    pos += 3 * gct_len
    # skip extension blocks (0x21) to reach the image descriptor
    while data[pos] == 0x21:
        pos += 2
        while data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1
    if data[pos] != 0x2C:
        raise ValueError(f"expected image descriptor, got {data[pos]:#x}")
    _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
    pos += 10
    if ipacked & 0x80:
        raise ValueError("local color tables unsupported")
    if ipacked & 0x40:
        raise ValueError("interlace unsupported")
    min_code_size = data[pos]
    pos += 1
    stream = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: missing block terminator")
        if data[pos] == 0:
            break
        n = data[pos]
        stream += data[pos + 1 : pos + 1 + n]
        pos += 1 + n
    # refuse-don't-fake (module posture): a second image (animated GIF)
    # after this frame's block terminator would otherwise be silently
    # dropped; require the 0x3B trailer, skipping any extension blocks
    # that legally sit between terminator and trailer.
    tpos = pos + 1  # past the 0x00 block terminator
    while tpos < len(data) and data[tpos] == 0x21:
        tpos += 2
        while tpos < len(data) and data[tpos] != 0:
            tpos += 1 + data[tpos]
        tpos += 1
    if tpos >= len(data) or data[tpos] != 0x3B:
        raise ValueError(
            "multi-image/animated GIF unsupported: trailer 0x3B not found "
            "after first image"
        )

    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in stream:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = table[: clear + 2]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                nbits = -1  # poison: outer loop keeps feeding, inner stops
                break
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        if nbits < 0:
            break
    if len(out) < iw * ih:
        raise ValueError(
            f"truncated GIF: decoded {len(out)} of {iw * ih} pixels"
        )
    idx = np.frombuffer(bytes(out[: iw * ih]), np.uint8)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("GIF index exceeds color table")
    return palette[idx].reshape(ih, iw, 3)

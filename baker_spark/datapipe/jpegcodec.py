"""Baseline JPEG codec — pure python + numpy, no external image libs.

Closes the last byte-level media stub: a REAL ITU T.81 baseline
(grayscale, 8-bit) encoder and decoder, so `media_features` /
`resize_media` operate on genuine entropy-coded JPEG bitstreams the
same way they already do on PNG (zlib) and GIF (pure-python LZW).

Encoder (`encode_gray_jpeg`): level shift, float FDCT, quantization,
zigzag, DC prediction, run/size AC coding, CANONICAL Huffman tables
built from the actual symbol frequencies (the libjpeg dummy-symbol
trick reserves the all-1s code as the spec recommends), byte stuffing.
Decoder (`decode_jpeg_pixels`): full marker walk (APPn/COM/DQT/DHT/
DRI/SOF0/SOF1/SOS), canonical Huffman decode, restart-marker handling,
dequant, dezigzag, float IDCT, level shift + clamp, crop from the
padded MCU grid. Anything outside the envelope (progressive, 12-bit,
multi-component, arithmetic coding) returns None — the same
sniff-don't-crash totality contract as the PNG/GIF/WAV decoders.

Exactness contract used by the oracle-gated fixture
(multimodal.jpeg_pixel_bytes): a block that is CONSTANT v has DCT
coefficients DC = 8*(v-128), AC = 0 exactly (the DC basis is flat and
every AC basis row sums to 0), so with an all-ones quantization table
the round trip is bit-exact and a SQL oracle can regenerate the pixels
arithmetically — while both codec halves stay fully general (the
AC run/size path is exercised by round-trip property tests on
non-constant blocks, tests/test_multimodal.py).

Reference parity: the reference engine has no media decode at all —
this extends the training-data-pipeline surface beyond it (multimodal
columns as opaque binary + typed decode, the brief's stub-allowed area,
here made real for PNG/GIF/WAV/JPEG).
"""

from __future__ import annotations

import struct

import numpy as np

# standard zigzag scan order: index i of the scan -> (row, col)
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthonormal DCT-II matrix: C[u, x] = s(u) * cos((2x+1) u pi / 16),
# FDCT = C @ B @ C.T, IDCT = C.T @ F @ C (exactly inverse in floats)
_C = np.zeros((8, 8))
for _u in range(8):
    _s = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _s * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits to represent |v|."""
    return 0 if v == 0 else int(v if v > 0 else -v).bit_length()


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths for a canonical Huffman table over ``freqs``.

    Follows libjpeg's table-building convention: a dummy 257th symbol
    with frequency 1 is included so the all-1-bits code is never
    assigned to a real symbol (T.81 K.2 recommends reserving it), then
    dropped from the emitted table. Ties prefer merging the dummy
    first, which keeps it at maximal depth."""
    DUMMY = 1 << 20
    nodes = [(f, 1 if s != DUMMY else 0, s) for s, f in freqs.items() if f > 0]
    nodes.append((1, 0, DUMMY))  # dummy sorts before real symbols on ties
    if len(nodes) == 1:
        return {}
    import heapq

    heap = [(f, tie, i, [s] if s != DUMMY else []) for i, (f, tie, s) in enumerate(nodes)]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    counter = len(heap)
    while len(heap) > 1:
        f1, _, _, s1 = heapq.heappop(heap)
        f2, _, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, 1, counter, s1 + s2))
        counter += 1
    return {s: d for s, d in depth.items() if freqs.get(s, 0) > 0}


def _canonical_codes(lengths: dict[int, int]):
    """(bits_per_length[1..16], ordered_symbols, {sym: (code, length)})
    — JPEG DHT layout + the matching encode map."""
    if any(ln > 16 for ln in lengths.values()):
        # tiny alphabets here never get near 16; fail loud if they do
        raise ValueError("huffman code length exceeds JPEG's 16-bit cap")
    order = sorted(lengths, key=lambda s: (lengths[s], s))
    bits = [0] * 17
    for s in order:
        bits[lengths[s]] += 1
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for s in order:
        ln = lengths[s]
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return bits[1:], order, codes


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per T.81 F.1.2.3

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (no stuffing); caller must be
        byte-aligned."""
        assert self.nbits == 0
        self.out += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _pad_blocks(pixels, width: int, height: int) -> np.ndarray:
    """Row-major gray samples -> float array padded to 8-multiples by
    edge replication (the standard MCU completion strategy)."""
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    return np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge").astype(np.float64)


def encode_gray_jpeg(
    pixels, width: int, height: int, qtable=None, restart_interval: int = 0
) -> bytes:
    """Encode row-major 8-bit grayscale samples as a baseline JPEG.

    ``qtable``: 64 ints in NATURAL (row-major) order; default all-ones
    (numerically near-lossless, and bit-exact on constant blocks —
    the property the oracle fixture relies on). ``restart_interval``:
    if > 0, emit a DRI segment and RSTn markers every that many MCUs
    (resets the DC predictor — exercises the decoder's resync path)."""
    q = np.ones((8, 8)) if qtable is None else np.asarray(qtable, dtype=np.float64).reshape(8, 8)
    padded = _pad_blocks(pixels, width, height) - 128.0
    by, bx = padded.shape[0] // 8, padded.shape[1] // 8

    # pass 1: quantized coefficients + symbol statistics
    blocks = []
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    prev_dc = 0
    nmcu = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                prev_dc = 0  # RSTn resets the DC predictor
            nmcu += 1
            b = padded[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
            coef = np.round((_C @ b @ _C.T) / q).astype(np.int64)
            zz = [int(coef[r, c]) for (r, c) in ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            dc_freq[_category(diff)] = dc_freq.get(_category(diff), 0) + 1
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1  # ZRL
                    run -= 16
                sym = (run << 4) | _category(v)
                ac_freq[sym] = ac_freq.get(sym, 0) + 1
                run = 0
            if run:
                ac_freq[0x00] = ac_freq.get(0x00, 0) + 1  # EOB
            blocks.append((diff, zz[1:]))

    dc_bits, dc_vals, dc_codes = _canonical_codes(_huffman_lengths(dc_freq))
    ac_bits, ac_vals, ac_codes = _canonical_codes(_huffman_lengths(ac_freq))

    # pass 2: entropy-coded scan
    w = _BitWriter()

    def put_coef(codes, sym, v):
        code, ln = codes[sym]
        w.put(code, ln)
        t = sym & 0x0F
        if t:
            w.put(v if v >= 0 else v + (1 << t) - 1, t)

    for i, (diff, acs) in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            w.align()
            w.raw(bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)]))
        put_coef(dc_codes, _category(diff), diff)
        run = 0
        for v in acs:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.put(code, ln)
                run -= 16
            put_coef(ac_codes, (run << 4) | _category(v), v)
            run = 0
        if run:
            code, ln = ac_codes[0x00]
            w.put(code, ln)
    scan = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qz = bytes(int(q[r, c]) for (r, c) in ZIGZAG)
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"  # SOI
        + seg(0xDB, bytes([0x00]) + qz)  # DQT, 8-bit, table 0
        + seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
        + dht
        + dri
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS: comp 1, DC0/AC0
        + scan
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    """MSB-first reader over entropy-coded data; unstuffs 0xFF 0x00,
    surfaces restart markers, stops at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(d):
                return False
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn: handled by caller via sync()
                self.marker = nxt
                return False
            else:  # a real marker terminates the scan
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        # fill whole bytes until n bits are buffered, then extract them
        # in ONE shift/mask — the per-bit Python call this replaces was
        # the decoder's hot path (~n function calls per coefficient)
        nbits = self.nbits
        while nbits < n:
            if not self._fill():
                return None
            nbits = self.nbits
        nbits -= n
        self.nbits = nbits
        v = (self.acc >> nbits) & ((1 << n) - 1)
        # drop consumed high bits so acc stays a machine-word-sized int
        self.acc &= (1 << nbits) - 1
        return v

    def sync_restart(self) -> bool:
        """Consume an expected RSTn: byte-align and skip the marker."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
            return True
        # tolerate readers that stopped exactly on the marker bytes
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            return True
        return False


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    # peek-then-walk: buffer up to 16 bits once, then try each code
    # length as a shift of the SAME window — one dict probe per length,
    # zero per-bit function calls (canonical codes are prefix-free, so
    # consuming ln bits on the first hit is exact)
    nb = reader.nbits
    while nb < 16 and reader._fill():
        nb = reader.nbits
    if nb == 0:
        return None
    window = reader.acc & ((1 << nb) - 1)
    get = table.get
    for ln in range(1, 17):
        if ln > nb:
            return None
        sym = get((ln, window >> (nb - ln)))
        if sym is not None:
            reader.nbits = nb - ln
            reader.acc = window & ((1 << (nb - ln)) - 1)
            return sym
    return None


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes, max_pixels: int = 16 * 1024 * 1024):
    """Full pixel decode for baseline/extended-sequential GRAYSCALE
    JPEG: returns ``(width, height, 1, bytearray)`` row-major or None
    (progressive, multi-component, 12-bit, arithmetic-coded, corrupt,
    or SOF dims over ``max_pixels`` — the decode-bomb guard, same
    default as multimodal.MAX_DECODE_PIXELS; uint16 dims reach 4.3G px
    and the block loop's cost scales with them, not with payload size).
    """
    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, list[int]] = {}
    hufftabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    restart_interval = 0
    comp_q = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None  # lost marker sync
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        (size,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        body = d[pos + 4 : pos + 2 + size]
        if len(body) < size - 2:
            return None
        if marker == 0xDB:  # DQT: one or more (Pq|Tq, 64 entries)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of envelope
                if i + 65 > len(body):
                    return None
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                if len(vals) < n:
                    return None
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                hufftabs[(tc, th)] = table
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            if len(body) < 9:  # 6 fixed + 3 per-component, comp_q = body[8]
                return None
            precision, height, width, nf = struct.unpack(">BHHB", body[:6])
            if precision != 8 or nf != 1:
                return None  # 12-bit or color: out of envelope
            if width * height > max_pixels:
                return None  # decode budget guard (see docstring)
            comp_q = body[8]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive/lossless/arithmetic: out of envelope
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if width is None or len(body) < 4 or body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            dc_tab = hufftabs.get((0, dc_id))
            ac_tab = hufftabs.get((1, ac_id))
            q = qtables.get(comp_q)
            if dc_tab is None or ac_tab is None or q is None:
                return None
            return _decode_scan(
                d, pos + 2 + size, width, height, q, dc_tab, ac_tab, restart_interval
            )
        pos += 2 + size
    return None


#: zigzag index -> natural (row-major) flat index, for the entropy loop
_ZZ_FLAT = [r * 8 + c for r, c in ZIGZAG]


def _decode_scan(d, pos, width, height, q, dc_tab, ac_tab, restart_interval):
    bx = (width + 7) // 8
    by = (height + 7) // 8
    qnat = np.zeros(64)
    for i, flat in enumerate(_ZZ_FLAT):
        qnat[flat] = q[i]
    reader = _BitReader(d, pos)
    pred = 0
    nblocks = 0
    # entropy-decode into a BOUNDED (chunk, 64) coefficient buffer and
    # batch-IDCT per chunk into the uint8 output (plain Python-int
    # writes into a per-block list — cheaper than per-element numpy
    # stores; the batched matmul replaces by*bx tiny 8x8 products).
    # Chunking caps the float64 intermediates at ~6 MB however large
    # the image: a whole-scan coefficient matrix plus the two matmul
    # temporaries is ~24-32 bytes/pixel — ~500 MB per image per task
    # at the 16 MP budget, enough for a few concurrent decode tasks to
    # OOM an executor. Math is float64 throughout either way, so the
    # chunked output is bit-identical to the whole-scan batch.
    chunk = 4096
    coefs = np.zeros((min(chunk, by * bx), 64))
    out8 = np.empty((by * bx, 8, 8), dtype=np.uint8)
    filled = 0  # blocks already flushed to out8

    def _flush(cnt: int) -> None:
        blocks = (coefs[:cnt] * qnat).reshape(-1, 8, 8)
        pix = _C.T @ blocks @ _C + 128.0
        out8[filled : filled + cnt] = np.clip(np.round(pix), 0, 255).astype(np.uint8)

    zz = _ZZ_FLAT
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and nblocks and nblocks % restart_interval == 0:
                if not reader.sync_restart():
                    return None
                pred = 0
            t = _decode_huff(reader, dc_tab)
            if t is None or t > 11:
                return None
            diff = 0
            if t:
                v = reader.receive(t)
                if v is None:
                    return None
                diff = _extend(v, t)
            pred += diff
            buf = [0.0] * 64
            buf[0] = pred
            k = 1
            while k < 64:
                sym = _decode_huff(reader, ac_tab)
                if sym is None:
                    return None
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        return None  # only ZRL has size 0
                    k += 16
                    continue
                k += run
                if k > 63:
                    return None
                v = reader.receive(size)
                if v is None:
                    return None
                buf[zz[k]] = _extend(v, size)
                k += 1
            coefs[nblocks - filled] = buf
            nblocks += 1
            if nblocks - filled == chunk:
                _flush(chunk)
                filled = nblocks
    if nblocks > filled:
        _flush(nblocks - filled)
    out = (
        out8.reshape(by, bx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(by * 8, bx * 8)
    )
    return int(width), int(height), 1, bytearray(out[:height, :width].tobytes())

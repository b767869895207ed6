"""64-bit RoaringBitmapArray codec for Delta deletion vectors.

The public formats involved (Delta PROTOCOL.md "Deletion Vectors" +
RoaringBitmap/RoaringFormatSpec "portable" serialization):

- payload = 4-byte LE magic ``1681511377`` + u64 LE bucket count, then
  per bucket a u32 LE high-key and a standard 32-bit roaring bitmap;
- 32-bit bitmaps: cookie 12346 (no runs; offset table present) or
  12347 (run-bitset follows; offsets only at ≥4 containers); array
  containers (≤4096 values, u16 each), bitmap containers (8 KiB),
  run containers (u16 start/length pairs).

The encoder emits the no-run layout with array/bitmap containers —
enough for any deleted-row set; the decoder handles all three
container kinds (cross-engine DVs may use runs).
"""

from __future__ import annotations

import struct

MAGIC = 1681511377


def roaring64_rows(data: bytes) -> list[int]:
    """Decode a DV payload to sorted-ish row indexes."""
    if len(data) < 4 or struct.unpack_from("<i", data, 0)[0] != MAGIC:
        raise ValueError("deletion vector payload missing magic 1681511377")
    pos = 4
    (n_buckets,) = struct.unpack_from("<Q", data, pos)
    pos += 8
    rows: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        base = high << 32
        (cookie,) = struct.unpack_from("<I", data, pos)
        runbits = b""
        if (cookie & 0xFFFF) == 12347:  # SERIAL_COOKIE (run containers)
            n_cont = (cookie >> 16) + 1
            pos += 4
            nrb = (n_cont + 7) // 8
            runbits = data[pos : pos + nrb]
            pos += nrb
            has_offsets = n_cont >= 4
        elif cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
            pos += 4
            (n_cont,) = struct.unpack_from("<I", data, pos)
            pos += 4
            has_offsets = True
        else:
            raise ValueError(f"unknown roaring cookie {cookie}")
        keys_cards = []
        for i in range(n_cont):
            key, card_m1 = struct.unpack_from("<HH", data, pos)
            pos += 4
            keys_cards.append((key, card_m1 + 1))
        if has_offsets:
            pos += 4 * n_cont
        for i, (key, card) in enumerate(keys_cards):
            kbase = base | (key << 16)
            is_run = bool(runbits) and (runbits[i // 8] >> (i % 8)) & 1
            if is_run:
                (n_runs,) = struct.unpack_from("<H", data, pos)
                pos += 2
                for _r in range(n_runs):
                    start, length = struct.unpack_from("<HH", data, pos)
                    pos += 4
                    rows.extend(kbase | v for v in range(start, start + length + 1))
            elif card <= 4096:
                vals = struct.unpack_from(f"<{card}H", data, pos)
                pos += 2 * card
                rows.extend(kbase | v for v in vals)
            else:
                words = struct.unpack_from("<1024Q", data, pos)
                pos += 8192
                for wi, w in enumerate(words):
                    while w:
                        b = w & -w
                        rows.append(kbase | (wi << 6) | (b.bit_length() - 1))
                        w ^= b
    return rows


def roaring64_payload(rows: list[int]) -> bytes:
    """Encode row indexes as a DV payload (no-run layout; array
    containers ≤4096 values, bitmap containers above)."""
    buckets: dict[int, dict[int, list[int]]] = {}
    for r in sorted(set(rows)):
        buckets.setdefault(r >> 32, {}).setdefault((r >> 16) & 0xFFFF, []).append(
            r & 0xFFFF
        )
    out = [struct.pack("<i", MAGIC), struct.pack("<Q", len(buckets))]
    for high in sorted(buckets):
        conts = buckets[high]
        keys = sorted(conts)
        out.append(struct.pack("<I", high))
        out.append(struct.pack("<I", 12346))
        out.append(struct.pack("<I", len(keys)))
        for k in keys:
            out.append(struct.pack("<HH", k, len(conts[k]) - 1))
        off = 4 + 4 + 4 * len(keys) + 4 * len(keys)
        sizes = [
            2 * len(conts[k]) if len(conts[k]) <= 4096 else 8192 for k in keys
        ]
        for sz in sizes:
            out.append(struct.pack("<I", off))
            off += sz
        for k in keys:
            vals = conts[k]
            if len(vals) <= 4096:
                out.append(struct.pack(f"<{len(vals)}H", *vals))
            else:
                bits = bytearray(8192)
                for v in vals:
                    bits[v >> 3] |= 1 << (v & 7)
                out.append(bytes(bits))
    return b"".join(out)

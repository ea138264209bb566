"""Minimal dahuffman-compatible HuffmanCodec shim (classic heapq Huffman,
bit-packed). Only the reference repo's usage surface: from_data, encode,
decode, get_code_table."""

import heapq
from collections import Counter


class _EOF:
    _instances = {}

    def __new__(cls):
        if cls not in cls._instances:
            cls._instances[cls] = super().__new__(cls)
        return cls._instances[cls]

    def __lt__(self, other):
        return True


class HuffmanCodec:
    def __init__(self, code_table):
        self._table = code_table
        self._decode = {(b, v): s for s, (b, v) in code_table.items()}

    @classmethod
    def from_data(cls, data):
        freq = Counter(data)
        freq[_EOF()] = 1
        heap = [(n, i, sym) for i, (sym, n) in enumerate(freq.items())]
        heapq.heapify(heap)
        nxt = len(heap)
        while len(heap) > 1:
            n1, _, a = heapq.heappop(heap)
            n2, _, b = heapq.heappop(heap)
            heapq.heappush(heap, (n1 + n2, nxt, (a, b)))
            nxt += 1
        table = {}

        def walk(node, bits, value):
            if isinstance(node, tuple) and len(node) == 2 and \
                    not isinstance(node, str):
                walk(node[0], bits + 1, value << 1)
                walk(node[1], bits + 1, (value << 1) | 1)
            else:
                table[node] = (max(bits, 1), value)

        walk(heap[0][2], 0, 0)
        return cls(table)

    def get_code_table(self):
        return self._table

    def encode(self, data):
        buf = bytearray()
        acc = 0
        nbits = 0
        for sym in list(data) + [_EOF()]:
            b, v = self._table[sym]
            acc = (acc << b) | v
            nbits += b
            while nbits >= 8:
                nbits -= 8
                buf.append((acc >> nbits) & 0xFF)
        if nbits:
            buf.append((acc << (8 - nbits)) & 0xFF)
        return bytes(buf)

    def decode(self, data):
        out = []
        bits, value = 0, 0
        eof = _EOF()
        for byte in data:
            for k in range(7, -1, -1):
                value = (value << 1) | ((byte >> k) & 1)
                bits += 1
                sym = self._decode.get((bits, value))
                if sym is not None:
                    if sym is eof:
                        return out
                    out.append(sym)
                    bits, value = 0, 0
        return out

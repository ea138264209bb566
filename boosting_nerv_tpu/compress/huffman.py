"""Huffman code-length accounting for the regression eval's bits-per-param
metrics (the role dahuffman plays at /root/reference/train_nerv_all.py:597-613
— only the code-table lengths are consumed, no bitstream is emitted)."""

from __future__ import annotations

import heapq
import itertools
from typing import Dict, Sequence


def huffman_code_lengths(counts: Dict) -> Dict:
    """Symbol -> Huffman code length (bits) for the given frequency table."""
    if not counts:
        return {}
    if len(counts) == 1:
        return {next(iter(counts)): 1}
    tiebreak = itertools.count()
    heap = [(freq, next(tiebreak), [sym]) for sym, freq in counts.items()]
    heapq.heapify(heap)
    lengths = {sym: 0 for sym in counts}
    while len(heap) > 1:
        f1, _, syms1 = heapq.heappop(heap)
        f2, _, syms2 = heapq.heappop(heap)
        for s in syms1 + syms2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, next(tiebreak), syms1 + syms2))
    return lengths


def huffman_total_bits(values: Sequence) -> tuple:
    """Total Huffman-coded bits for a flat symbol sequence.
    Returns (total_bits, n_symbols)."""
    import numpy as np

    vals = np.asarray(values).ravel()
    unique, counts = np.unique(vals, return_counts=True)
    table = {u.item(): int(c) for u, c in zip(unique, counts)}
    lengths = huffman_code_lengths(table)
    total = sum(table[s] * lengths[s] for s in table)
    return total, int(vals.size)

from .huffman import huffman_code_lengths, huffman_total_bits

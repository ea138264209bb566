from .fast_decode import build_fast_decode

from .fast_decode import (build_fast_decode, build_fast_decode_v5,
                          build_serving_decode, calibrate_planar_bounds)

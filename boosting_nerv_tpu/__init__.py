"""boosting_nerv_tpu — a TPU-native (JAX/XLA/Pallas) framework for boosted
implicit neural video representations.

Provides the full capability surface of Boosting-NeRV (CVPR 2024): the
NeRV-Boost / E-NeRV-Boost / HNeRV-Boost / HNeRV model families with a
conditional decoder (temporal-aware affine transform modulation), sinusoidal
NeRV-like upsampling blocks, and the high-frequency-preserving
L1 + MS-SSIM + FFT loss; four tasks (video regression, compression with
consistent-entropy-minimisation quant-aware finetuning + ANS coding,
inpainting, frame interpolation); PTQ + Huffman bpp accounting; and
mesh-sharded (pjit) training.

Reference behaviour is documented in SURVEY.md; reference file:line citations
appear in docstrings throughout this package (the implementation itself is a
from-scratch, NHWC, functional JAX design — not a port).
"""

__version__ = "0.1.0"

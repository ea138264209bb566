from .pe import PEConfig, position_encoding
from .activations import get_activation
from .pixelshuffle import depth_to_space, space_to_depth
from .msssim import ssim, ms_ssim
from .losses import loss_fn, out_img
from .metrics import psnr, psnr_per_frame, msssim_per_frame

from .registry import build_model
from .nerv import NeRVBoost
from .enerv import ENeRV, ENeRVBoost
from .hnerv import HNeRV, HNeRVBoost, decoder_only_params

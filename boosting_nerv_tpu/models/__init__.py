from .registry import build_model
from .nerv import NeRVBoost
from .enerv import ENeRVBoost
from .hnerv import HNeRV, HNeRVBoost

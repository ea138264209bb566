from .adan import adan
from .schedules import lr_multiplier

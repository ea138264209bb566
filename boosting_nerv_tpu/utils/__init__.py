from .logger import RunLogger

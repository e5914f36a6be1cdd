from . import image, logger, serial
from .timer import Averager, Timer

__all__ = ["image", "logger", "serial", "Averager", "Timer"]

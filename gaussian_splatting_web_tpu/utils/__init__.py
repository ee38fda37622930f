from .image import write_png, read_image
from .metrics import Timer, throughput_mpixps, FrameStats

__all__ = ["write_png", "read_image", "Timer", "throughput_mpixps", "FrameStats"]

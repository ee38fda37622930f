from .cpu_reference import render_reference

__all__ = ["render_reference"]

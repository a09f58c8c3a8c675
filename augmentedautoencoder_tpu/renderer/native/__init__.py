"""Native (C++) rasterizer backend, built on demand and bound via ctypes."""

from .binding import NativeRasterizer, native_available

__all__ = ["NativeRasterizer", "native_available"]

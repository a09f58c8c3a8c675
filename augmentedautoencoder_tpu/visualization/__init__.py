"""Visualization: pose overlays and training-figure helpers."""

from .render_pose import PoseVisualizer

__all__ = ["PoseVisualizer"]

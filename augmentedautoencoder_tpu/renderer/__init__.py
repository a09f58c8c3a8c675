"""Offscreen object rendering (offline CPU data-generation stage).

The reference renders with OpenGL 4.5 via EGL (auto_pose/meshrenderer/).
Rendered views are consumed as cached numpy arrays by the training/embedding
pipeline, so in the TPU build rendering is an offline CPU stage with the same
output semantics (BGR uint8 + eye-space z depth float32):

  * `Renderer` — reference-API facade over the software rasterizer
    (C++ native backend when available, numpy fallback)
  * `FakeRenderer` — analytic test backend, no mesh required
"""

from .facade import Renderer
from .fake import FakeRenderer
from .mesh import Mesh, load_mesh

__all__ = ["Renderer", "FakeRenderer", "Mesh", "load_mesh"]

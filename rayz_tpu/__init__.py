"""rayz_tpu — a TPU-native differentiable path tracer in JAX/XLA/Pallas.

Brand-new framework with the capability set of the Zig CPU ray tracer
``jlucier/rayz`` (see SURVEY.md), redesigned TPU-first: flat SoA scenes,
matmul-formulated intersection, masked material dispatch, a fixed-depth scan
integrator differentiable in reverse mode, image-tile sharding over device
meshes, and Pallas kernels on the hot path.
"""

from .models import (
    Camera,
    Scene,
    SceneBuilder,
    generate_rays,
    make_camera,
)
from .models import scenes
from .ops import (RenderConfig, render, render_diff, render_diff_pp, render_fast, render_jit,
                  render_pallas, render_pallas_sharded, trace_rays)
from .io import read_ppm, to_u8, write_png, write_ppm

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Scene",
    "SceneBuilder",
    "make_camera",
    "generate_rays",
    "scenes",
    "RenderConfig",
    "render",
    "render_jit",
    "render_fast",
    "render_diff",
    "render_diff_pp",
    "render_pallas",
    "render_pallas_sharded",
    "trace_rays",
    "to_u8",
    "write_ppm",
    "write_png",
    "read_ppm",
]

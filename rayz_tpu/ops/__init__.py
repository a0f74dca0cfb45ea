from .integrator import RenderConfig, render, render_jit, trace_rays
from .intersect import HitRecord, aabb_hit, intersect, intersect_spheres, intersect_triangles
from .shade import scatter, schlick_reflectance, sky_color, texture_value

__all__ = [
    "RenderConfig",
    "render",
    "render_jit",
    "trace_rays",
    "HitRecord",
    "intersect",
    "intersect_spheres",
    "intersect_triangles",
    "aabb_hit",
    "scatter",
    "sky_color",
    "texture_value",
    "schlick_reflectance",
]

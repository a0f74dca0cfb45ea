from .camera import Camera, generate_rays, make_camera
from .scene import (
    DIFFUSE_HEMISPHERE,
    DIFFUSE_UNIT_SPHERE,
    DIFFUSE_UNIT_SPHERE_SURFACE,
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_METALLIC,
    TEX_CHECKER,
    TEX_SOLID,
    Scene,
    SceneBuilder,
)

__all__ = [
    "Camera",
    "make_camera",
    "generate_rays",
    "Scene",
    "SceneBuilder",
    "MAT_DIFFUSE",
    "MAT_METALLIC",
    "MAT_DIELECTRIC",
    "TEX_SOLID",
    "TEX_CHECKER",
    "DIFFUSE_UNIT_SPHERE",
    "DIFFUSE_UNIT_SPHERE_SURFACE",
    "DIFFUSE_HEMISPHERE",
]

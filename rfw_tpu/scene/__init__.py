from .lights import AreaLight, DirectionalLight, PointLight, SpotLight
from .materials import HostMaterial, MapProps, MaterialList
from .mesh import SceneMesh, TriangleSoA, build_triangles
from .object import SceneNode, SceneObject, Skin
from .quad import make_quad
from .skybox import Skybox
from .texture import Texture, build_texture_atlas


def load_object(path: str, materials: MaterialList,
                material_override: int = -1) -> SceneObject:
    """Dispatch by extension (reference system::add_object, system.cpp:499-554:
    gltf/glb → glTF loader, everything else → Assimp; here: OBJ)."""
    p = str(path).lower()
    if p.endswith(".gltf") or p.endswith(".glb"):
        from .gltf import load_gltf
        return load_gltf(path, materials, material_override)
    if p.endswith(".obj"):
        from .obj import load_obj
        return load_obj(path, materials, material_override)
    if p.endswith(".ply"):
        from .ply import load_ply
        return load_ply(path, materials, material_override)
    if p.endswith(".stl"):
        from .stl import load_stl
        return load_stl(path, materials, material_override)
    if p.endswith(".dae"):
        from .collada import load_collada
        return load_collada(path, materials, material_override)
    if p.endswith(".fbx"):
        from .fbx import load_fbx
        return load_fbx(path, materials, material_override)
    raise ValueError(f"unsupported model format: {path}")


__all__ = [
    "AreaLight", "DirectionalLight", "PointLight", "SpotLight",
    "HostMaterial", "MapProps", "MaterialList",
    "SceneMesh", "TriangleSoA", "build_triangles",
    "SceneNode", "SceneObject", "Skin", "make_quad", "Skybox",
    "Texture", "build_texture_atlas", "load_object",
]

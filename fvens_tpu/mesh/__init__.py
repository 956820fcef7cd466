from .reader import MeshData, compare_meshes, read_mesh, read_gmsh2, read_su2
from .device_mesh import CompiledMesh, compile_mesh
from . import meshgen

__all__ = [
    "MeshData", "compare_meshes", "read_mesh", "read_gmsh2", "read_su2",
    "CompiledMesh", "compile_mesh", "meshgen",
]

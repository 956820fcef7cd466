from .reader import MeshData, read_mesh, read_gmsh2, read_su2
from .device_mesh import CompiledMesh, compile_mesh
from . import meshgen

__all__ = [
    "MeshData", "read_mesh", "read_gmsh2", "read_su2",
    "CompiledMesh", "compile_mesh", "meshgen",
]

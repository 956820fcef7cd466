from .gas import GasPhysics

__all__ = ["GasPhysics"]

from .steady import SteadyForwardEuler, SteadyBackwardEuler, SolveInfo
from .unsteady import TVDRKSolver

__all__ = ["SteadyForwardEuler", "SteadyBackwardEuler", "TVDRKSolver",
           "SolveInfo"]

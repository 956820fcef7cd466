from .casesolvers import SteadyFlowCase, initial_state, build_space

__all__ = ["SteadyFlowCase", "initial_state", "build_space"]

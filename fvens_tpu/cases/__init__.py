from .casesolvers import (DistributedFlowCase, SteadyFlowCase,
                          UnsteadyFlowCase, build_space, initial_state)

__all__ = ["SteadyFlowCase", "UnsteadyFlowCase", "DistributedFlowCase",
           "initial_state", "build_space"]

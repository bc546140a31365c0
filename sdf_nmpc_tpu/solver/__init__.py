"""SQP-RTI solver engine (TPU-native acados/HPIPM replacement)."""

from .integrator import erk4, erk4_with_sensitivities
from .qp import QpData, QpResult, solve_qp
from .qp_riccati import RiccatiQpResult, StageQpData, solve_qp_riccati
from .sqp import (
    STATUS_NAN,
    STATUS_OK,
    SolveInputs,
    SolveResult,
    SolverState,
    init_state,
    make_rti_step,
    shift_state,
)

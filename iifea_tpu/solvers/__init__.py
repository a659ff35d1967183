from iifea_tpu.solvers.krylov import cg, bicgstab, gmres, gcr  # noqa: F401
from iifea_tpu.solvers.direct import solve_direct  # noqa: F401
from iifea_tpu.solvers.ksp import solve_ksp  # noqa: F401
from iifea_tpu.solvers.newton import solve_nonlinear, solve_newtons_linear  # noqa: F401
from iifea_tpu.solvers.trim import trim_mask_from_diag, apply_trim_rhs  # noqa: F401
from iifea_tpu.solvers.condition import estimate_condition_number  # noqa: F401
from iifea_tpu.solvers.lattice_fast import BinnedLatticeSolver  # noqa: F401

from fish_eye_bundle_adjustment_tpu.solver.dense import solve_dense, DenseResult  # noqa: F401
from fish_eye_bundle_adjustment_tpu.solver.linearize import Linearizer  # noqa: F401

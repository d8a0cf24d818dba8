from fish_eye_bundle_adjustment_tpu.parallel.mesh import make_mesh  # noqa: F401
from fish_eye_bundle_adjustment_tpu.parallel.dist_schur import solve_schur_distributed  # noqa: F401

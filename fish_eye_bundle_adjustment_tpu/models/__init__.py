from fish_eye_bundle_adjustment_tpu.models.projection import (  # noqa: F401
    MODEL_IDS,
    project_obs,
    residual_obs,
    rotation_matrix,
    world_to_camera,
)

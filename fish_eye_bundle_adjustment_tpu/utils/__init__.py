from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout  # noqa: F401

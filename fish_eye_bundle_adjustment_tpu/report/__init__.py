from fish_eye_bundle_adjustment_tpu.report.writers import write_reports  # noqa: F401

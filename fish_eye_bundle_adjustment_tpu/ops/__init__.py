from fish_eye_bundle_adjustment_tpu.ops.segment import (  # noqa: F401
    SegmentLayout,
    sorted_segment_sum,
)

from usip_tpu.eval.export import (
    ensure_keypoint_number,
    nms,
    read_keypoints_bin,
    select_keypoints,
    write_keypoints_bin,
)
from usip_tpu.eval.registration import (
    RansacResult,
    RegistrationStats,
    evaluate_registration,
    kabsch,
    match_descriptors_1nn,
    ransac_rigid,
    transform_error,
)
from usip_tpu.eval.repeatability import (
    apply_transform,
    dataset_repeatability,
    pair_repeatability,
)

__all__ = [
    "ensure_keypoint_number",
    "nms",
    "read_keypoints_bin",
    "select_keypoints",
    "write_keypoints_bin",
    "RansacResult",
    "RegistrationStats",
    "evaluate_registration",
    "kabsch",
    "match_descriptors_1nn",
    "ransac_rigid",
    "transform_error",
    "apply_transform",
    "dataset_repeatability",
    "pair_repeatability",
]

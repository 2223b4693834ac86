"""usip_tpu — a TPU-native (JAX/XLA/Pallas) framework for unsupervised 3D keypoint
detection and description on point clouds.

Re-implements the full capability surface of the USIP reference (unsupervised stable
interest point detection, ICCV 2019): siamese keypoint detectors over five point-cloud
domains (ModelNet40/SHREC, Oxford RobotCar, KITTI, SceneNN, 3DMatch), ball-grouping
keypoint descriptors, probabilistic chamfer training, keypoint export with NMS, and a
pure-Python evaluation stack (repeatability, RANSAC registration) replacing the
reference's MATLAB pipelines.

Design stance (TPU-first, not a port):
  * channels-last ``(B, N, C)`` tensors everywhere; every shared-MLP is a dense matmul
    on the MXU,
  * fixed shapes + keyed PRNG; augmentation and farthest-point sampling run on device
    inside the jitted train step,
  * grouping ops (point->node assignment, scatter-max, ball query, kNN) are functional
    XLA/Pallas ops with dense reference implementations and property tests,
  * data parallelism via ``jax.sharding`` over a device mesh (ICI collectives), not
    DataParallel replication.
"""

from usip_tpu.version import __version__

__all__ = ["__version__", "Config", "get_config", "Detector", "Descriptor",
           "KeypointPipeline"]


def __getattr__(name):
    """Lazy top-level API (keeps `import usip_tpu` light; jax loads on use)."""
    if name in ("Config", "get_config"):
        from usip_tpu import config
        return getattr(config, name)
    if name in ("Detector", "Descriptor"):
        from usip_tpu import models
        return getattr(models, name)
    if name == "KeypointPipeline":
        from usip_tpu.inference import KeypointPipeline
        return KeypointPipeline
    raise AttributeError(name)

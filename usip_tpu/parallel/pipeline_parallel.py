"""Two-stage pipeline parallelism for the detect -> describe serving path.

USIP serving is an inherent two-stage pipeline: the detector produces
keypoints, the descriptor consumes them (reference
evaluation/save_keypoints.py runs them back-to-back on one GPU). Here the two
stages live on *different devices*: the detector's variables are committed to
stage-0, the descriptor's to stage-1, and microbatches stream through both.
JAX's async dispatch does the pipelining — enqueueing detect(i+1) on stage 0
does not wait for describe(i) on stage 1, so steady-state throughput is set by
the slower stage instead of the sum (classic GPipe with two cells; the
keypoint handoff is a tiny (B, M, 3) transfer).

This is inter-op pipeline parallelism; combine with the intra-op modes for a
3-axis story: dp (`mesh.py`), sp (`sharded_*.py`), tp (`tensor_parallel.py`).
Expert parallelism has no analog — USIP has no mixture-of-experts component.

Functional on any two jax devices (the driver dryrun certifies it on virtual
CPU devices; overlap is measurable only with >=2 real chips).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from usip_tpu.config import Config
from usip_tpu.models.descriptor import Descriptor
from usip_tpu.models.detector import Detector

Array = jax.Array


class DetectDescribePipeline:
    """Stage-placed detect -> describe pipeline.

    Args:
      cfg: full config (detector + descriptor sections).
      det_vars / desc_vars: flax variables of ``Detector`` / ``Descriptor``.
      devices: two devices (stage 0: detector, stage 1: descriptor). Defaults
        to the first and last of ``jax.devices()`` (same device twice on a
        single-chip host — still correct, just unpipelined).
    """

    def __init__(self, cfg: Config, det_vars, desc_vars,
                 devices: Optional[Sequence] = None):
        if devices is None:
            devs = jax.devices()
            devices = (devs[0], devs[-1])
        assert len(devices) == 2, "two pipeline stages -> two devices"
        self.cfg = cfg
        self.d0, self.d1 = devices
        self._det_vars = jax.device_put(det_vars, self.d0)
        self._desc_vars = jax.device_put(desc_vars, self.d1)
        det = Detector(cfg.detector)
        desc = Descriptor(cfg.descriptor)
        # jit once; computation follows the committed operands' devices
        self._detect = jax.jit(
            lambda v, pc, sn, node: det.apply(v, pc, sn, node, train=False))
        self._describe = jax.jit(
            lambda v, pc, sn, kp, key: desc.apply(v, pc, sn, kp, key=key,
                                                  train=False))

    def __call__(self, microbatches: Sequence[Tuple[Array, Array, Array]],
                 key: Array) -> List[Tuple[Array, Array, Array]]:
        """Stream ``(pc, sn, node)`` microbatches through both stages.

        Enqueues every stage-0 and stage-1 program before fetching anything,
        so detect(i+1) overlaps describe(i) across the two devices. Returns
        per-microbatch ``(keypoints, sigmas, descriptors)`` (on stage
        devices; index/fetch to materialize).
        """
        keys = jax.random.split(key, max(len(microbatches), 1))
        out = []
        for (pc, sn, node), k in zip(microbatches, keys):
            pc0 = jax.device_put(pc, self.d0)
            sn0 = jax.device_put(sn, self.d0)
            node0 = jax.device_put(node, self.d0)
            _, kp, sig = self._detect(self._det_vars, pc0, sn0, node0)
            # stage handoff: only the (B, M, 3) keypoints cross devices ...
            kp1 = jax.device_put(kp, self.d1)
            pc1 = jax.device_put(pc, self.d1)
            sn1 = jax.device_put(sn, self.d1)
            d, _ = self._describe(self._desc_vars, pc1, sn1, kp1,
                                  jax.device_put(k, self.d1))
            out.append((kp, sig, d))
        return out


def pipeline_detect_describe(cfg: Config, det_vars, desc_vars, microbatches,
                             key: Array, devices: Optional[Sequence] = None
                             ) -> List[Tuple[Array, Array, Array]]:
    """One-shot helper: build a ``DetectDescribePipeline`` and run it."""
    return DetectDescribePipeline(cfg, det_vars, desc_vars, devices)(
        microbatches, key)


__all__ = ["DetectDescribePipeline", "pipeline_detect_describe"]

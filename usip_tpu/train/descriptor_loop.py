"""Descriptor training engine: frozen detector -> keypoints -> descriptor triplet
training (reference oxford/kitti/scenenn train_descriptor.py, unified)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import Config
from usip_tpu.data.pipeline import BatchLoader
from usip_tpu.models import Descriptor
from usip_tpu.parallel import make_mesh, replicate, shard_batch
from usip_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from usip_tpu.train.loop import (_fetch_metrics, init_detector_state,
                                 prefetch_batches)
from usip_tpu.train.state import (TrainState, lr_at_epoch, make_adam,
                                  set_learning_rate)
from usip_tpu.train.steps import (DescriptorBatch, make_descriptor_train_step,
                                  pack_pair_batch)
from usip_tpu.utils.logging import MetricsLogger, RunningAverages


def init_descriptor_state(cfg: Config, seed: int = 0):
    model = Descriptor(cfg.descriptor)
    n, m = cfg.data.input_pc_num, cfg.data.node_num
    s = cfg.descriptor.surface_normal_len
    dummy_pc = jnp.zeros((2, n, 3))
    dummy_sn = jnp.zeros((2, n, s))
    dummy_kp = jnp.zeros((2, m, 3))
    variables = model.init(jax.random.PRNGKey(seed), dummy_pc, dummy_sn,
                           dummy_kp, key=jax.random.PRNGKey(0), train=False)
    return model, TrainState.create(variables, make_adam(cfg.train.lr))


class _SyntheticPairDataset:
    """Synthetic anchor/positive pairs for smoke runs: two samplings of the same
    shape; negatives are any other batch entry."""

    def __init__(self, cfg: Config, size: int = 32, seed: int = 0):
        from usip_tpu.data.synthetic import SyntheticDataset
        self.base = SyntheticDataset(size=size,
                                     input_pc_num=cfg.data.input_pc_num,
                                     surface_normal_len=cfg.descriptor.surface_normal_len,
                                     seed=seed)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, index):
        item = self.base[index]
        return {"anc_pc": item["src_pc"], "anc_sn": item["src_sn"],
                "pos_pc": item["dst_pc"], "pos_sn": item["dst_sn"],
                "index": np.int64(index)}


class DescriptorEngine:
    def __init__(self, cfg: Config, detector_checkpoint: str,
                 train_loader: Optional[BatchLoader] = None,
                 test_loader: Optional[BatchLoader] = None,
                 mine_negatives=None, use_cgf: Optional[bool] = None,
                 synthetic: bool = False, out_dir: Optional[str] = None):
        self.cfg = cfg
        self.out_dir = out_dir or os.path.join(cfg.train.checkpoint_dir,
                                               cfg.train.name + "_descriptor")
        os.makedirs(self.out_dir, exist_ok=True)
        if use_cgf is None:
            use_cgf = cfg.descriptor.use_cgf_loss
        if use_cgf is None:
            use_cgf = cfg.descriptor.use_global_context  # indoor pipeline
        self.use_cgf = use_cgf
        self.select_best_by = cfg.train.select_best_by
        if self.select_best_by not in ("loss", "match_acc"):
            raise ValueError(
                f"train.select_best_by={self.select_best_by!r}: expected "
                "'loss' or 'match_acc'")
        if self.select_best_by == "match_acc" and not self.use_cgf:
            raise ValueError(
                "train.select_best_by='match_acc' requires the CGF objective "
                "(descriptor.use_cgf_loss=true): the matching-accuracy metric "
                "is computed under the CGF GT alignment, which the scan "
                "triplet path does not have in-step")

        # frozen detector (reference loads + freeze_model,
        # oxford/train_descriptor.py:70-77)
        self.detector, det_state = init_detector_state(cfg, cfg.train.seed)
        det_state, _ = restore_checkpoint(detector_checkpoint, det_state)
        self.det_state = det_state

        self.descriptor, state = init_descriptor_state(cfg, cfg.train.seed + 7)
        self.mesh = make_mesh(cfg.train.num_devices) \
            if cfg.train.num_devices > 1 else None
        if self.mesh is not None:
            state = replicate(self.mesh, state)
            self.det_state = replicate(self.mesh, self.det_state)
        self.state = state

        if train_loader is None:
            if not synthetic:
                raise ValueError("provide train_loader or synthetic=True")
            ds = _SyntheticPairDataset(cfg)
            train_loader = BatchLoader(ds, cfg.train.batch_size, shuffle=True,
                                       num_workers=2)
            mine_negatives = None
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.mine_negatives = mine_negatives

        self.step_fn = jax.jit(
            make_descriptor_train_step(cfg, self.detector, self.descriptor,
                                       use_cgf=self.use_cgf),
            donate_argnums=(0,))
        # eval = the same objective without the gradient step (the reference's
        # per-epoch descriptor test sweep, oxford/train_descriptor.py test loop)
        self.eval_fn = jax.jit(
            make_descriptor_train_step(cfg, self.detector, self.descriptor,
                                       use_cgf=self.use_cgf, eval_only=True))
        self.logger = MetricsLogger(self.out_dir, cfg.train.name + "_desc")
        self._key = jax.random.PRNGKey(cfg.train.seed + 13)
        # seeded fallback negatives (round-1 used bare np.random, breaking
        # run-to-run reproducibility when no miner is supplied)
        self._np_rng = np.random.default_rng(cfg.train.seed + 21)
        self.best_test_loss = float("inf")
        self.start_epoch = 0
        # divergence abort, parity with DetectorEngine (SURVEY §5.3)
        self.max_nonfinite = 5
        self._nonfinite_streak = 0

    def resume(self, path: str) -> int:
        """Exact resume (descriptor state; the frozen detector reloads from its
        own checkpoint at construction) — parity with DetectorEngine.resume."""
        self.state, meta = restore_checkpoint(path, self.state)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        if meta and "epoch" in meta:
            self.start_epoch = int(meta["epoch"]) + 1
        if meta:
            # restore the selection score under the SAME criterion this engine
            # gates on (a checkpoint written before the metric existed simply
            # leaves the gate open)
            score = self._selection_score(
                {k: float(v) for k, v in meta.items()
                 if isinstance(v, (int, float))})
            if score != float("inf"):
                self.best_test_loss = score
        return self.start_epoch

    def _device_batch(self, raw: Dict[str, np.ndarray]):
        b = raw["anc_pc"].shape[0]
        if self.mine_negatives is not None:
            neg_idx = self.mine_negatives(raw)
        else:
            # default in-batch negatives: shifted permutation (seeded)
            neg_idx = (np.arange(b) + 1 + self._np_rng.integers(0, b - 1)) % b \
                if b > 1 else np.zeros(b, np.int64)
        if self.mesh is not None:
            batch = DescriptorBatch(
                anc_pc=raw["anc_pc"], anc_sn=raw["anc_sn"],
                pos_pc=raw["pos_pc"], pos_sn=raw["pos_sn"],
                neg_idx=np.asarray(neg_idx, np.int64))
            return DescriptorBatch(*shard_batch(self.mesh, tuple(batch)))
        # single-device: ONE packed buffer instead of five leaves — each
        # device_put leaf costs a full RPC on the remote tunnel, which made
        # the 5-leaf wire 2.43x off the pure step (PERFORMANCE.md
        # descriptor-engine section); fp16 wire per cfg.data.wire_dtype
        batch = pack_pair_batch(raw["anc_pc"], raw["anc_sn"],
                                raw["pos_pc"], raw["pos_sn"], neg_idx,
                                wire=self.cfg.data.wire_dtype)
        return jax.device_put(batch)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        lr = lr_at_epoch(cfg.train.lr, epoch, cfg.train.lr_decay_step,
                         cfg.train.lr_decay_ratio, cfg.train.lr_clip)
        self.state = set_learning_rate(self.state, lr)
        averages = RunningAverages()
        pending = []
        epoch_dev = jnp.asarray(epoch)
        for i, (batch, batch_size) in enumerate(
                prefetch_batches(self.train_loader, self._device_batch)):
            key = jax.random.fold_in(jax.random.fold_in(self._key, 0),
                                     cfg.train.seed + 1_000_000 * epoch + i)
            self.state, metrics = self.step_fn(self.state, self.det_state,
                                               batch, key, epoch_dev)
            pending.append((metrics, batch_size))
            if i % cfg.train.log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                # same divergence abort as DetectorEngine (SURVEY §5.3): a
                # NaN descriptor run must not train to completion silently
                if not np.isfinite(host.get("loss", 0.0)):
                    self._nonfinite_streak += 1
                    self.logger.log(int(self.state.step), epoch,
                                    {"nonfinite_loss": 1.0}, prefix="warn")
                    if self._nonfinite_streak >= self.max_nonfinite:
                        raise FloatingPointError(
                            f"{self.max_nonfinite} consecutive non-finite "
                            "descriptor losses — aborting (restore the last "
                            "checkpoint, lower LR)")
                else:
                    self._nonfinite_streak = 0
                self.logger.log(int(self.state.step), epoch, host,
                                prefix="desc")
        for host_metrics, weight in _fetch_metrics(pending):
            averages.update(host_metrics, weight=weight)
        return averages.averages()

    def test_epoch(self, epoch: int) -> Dict[str, float]:
        if self.test_loader is None:
            return {}
        averages = RunningAverages()
        pending = []
        epoch_dev = jnp.asarray(epoch)
        for i, (batch, batch_size) in enumerate(
                prefetch_batches(self.test_loader, self._device_batch)):
            # test stream folded under role 1 so it can never collide with
            # a train step key (role 0), matching DetectorEngine._stream_key
            key = jax.random.fold_in(jax.random.fold_in(self._key, 1), i)
            _, metrics = self.eval_fn(self.state, self.det_state, batch, key,
                                      epoch_dev)
            pending.append((metrics, batch_size))
        for host_metrics, weight in _fetch_metrics(pending):
            averages.update(host_metrics, weight=weight)
        avg = averages.averages()
        if avg:
            self.logger.log(int(self.state.step), epoch, avg, prefix="desc_test")
        return avg

    def _selection_score(self, metrics: Dict[str, float]) -> float:
        """Lower-is-better best.msgpack score per cfg.train.select_best_by:
        the test loss (reference parity), or the negated match_acc
        registration proxy. Epochs missing the criterion metric score +inf
        (they never win)."""
        if self.select_best_by == "match_acc":
            return -metrics.get("match_acc", -float("inf"))
        return metrics.get("loss", float("inf"))

    def maybe_save(self, epoch: int, metrics: Dict[str, float]) -> bool:
        """Criterion-gated best.msgpack (default: best test loss, parity with
        DetectorEngine and the reference descriptor drivers'
        oxford/train_descriptor.py test loop; train.select_best_by='match_acc'
        gates on the in-step matching-accuracy registration proxy instead —
        ``best_test_loss`` then holds -match_acc)."""
        score = self._selection_score(metrics)
        if score < self.best_test_loss:
            self.best_test_loss = score
            save_checkpoint(os.path.join(self.out_dir, "best.msgpack"),
                            self.state, metadata={"epoch": epoch, **metrics})
            return True
        return False

    def fit(self, epochs: Optional[int] = None):
        epochs = epochs or self.cfg.train.epochs
        for epoch in range(self.start_epoch, epochs):
            avg = self.train_epoch(epoch)
            self.logger.log(int(self.state.step), epoch, avg, prefix="desc_epoch")
            test_avg = self.test_epoch(epoch)
            # gate on test loss when a test split exists, else train loss
            self.maybe_save(epoch, test_avg or avg)
            save_checkpoint(os.path.join(self.out_dir, "last.msgpack"),
                            self.state,
                            metadata={"epoch": epoch, **(test_avg or avg)})
            if self.cfg.train.keep_epoch_checkpoints:
                save_checkpoint(
                    os.path.join(self.out_dir, f"epoch_{epoch}.msgpack"),
                    self.state, metadata={"epoch": epoch, **(test_avg or avg)})
        return self.state

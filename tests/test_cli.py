"""CLI-level integration: drive the user-facing commands in-process on tiny
synthetic configs (train -> export -> eval roundtrip)."""

import json
import os

import numpy as np
import pytest

from usip_tpu import cli

TINY = [
    "--override", "data.input_pc_num=128",
    "--override", "data.node_num=16",
    "--override", "detector.c1=16",
    "--override", "detector.c2=32",
    "--override", "detector.node_knn_k=4",
    "--override", "descriptor.descriptor_len=16",
    "--override", "descriptor.ball_nsamples=8",
    "--override", "descriptor.ball_radius=0.6",
    "--override", "descriptor.surface_normal_len=3",
    "--override", "train.log_every=1000",
]


def test_cli_train_export_eval_roundtrip(tmp_path, capsys):
    ckpt_dir = str(tmp_path / "ckpts")
    cli.main(["train-detector", "--dataset", "modelnet", "--synthetic",
              "--epochs", "1", "--batch-size", "4", "--name", "t",
              "--checkpoints-dir", ckpt_dir] + TINY)
    best = os.path.join(ckpt_dir, "t", "last.msgpack")
    assert os.path.exists(best)

    kp_out = str(tmp_path / "kp")
    cli.main(["export-keypoints", "--dataset", "modelnet", "--synthetic",
              "--checkpoint", best, "--out", kp_out,
              "--num-keypoints", "8", "--batch-size", "4",
              "--checkpoints-dir", ckpt_dir] + TINY)
    files = os.listdir(os.path.join(kp_out, "00"))
    assert len(files) == 16

    # identity-GT repeatability of the export against itself must be 1.0
    gt_dir = str(tmp_path / "gt")
    os.makedirs(gt_dir)
    for i in range(16):
        np.save(os.path.join(gt_dir, f"{i}.npy"), np.eye(4))
    capsys.readouterr()
    cli.main(["eval-repeatability", "--anc-dir", kp_out, "--pos-dir", kp_out,
              "--gt-dir", gt_dir, "--inlier-radius", "0.05"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["repeatability"] == 1.0
    assert out["pairs"] == 16


def test_cli_descriptor_roundtrip(tmp_path, capsys):
    ckpt_dir = str(tmp_path / "ckpts")
    cli.main(["train-detector", "--dataset", "modelnet", "--synthetic",
              "--epochs", "1", "--batch-size", "4", "--name", "t",
              "--checkpoints-dir", ckpt_dir] + TINY)
    det = os.path.join(ckpt_dir, "t", "last.msgpack")
    cli.main(["train-descriptor", "--dataset", "modelnet", "--synthetic",
              "--epochs", "1", "--batch-size", "4", "--name", "t",
              "--checkpoints-dir", ckpt_dir,
              "--detector-checkpoint", det] + TINY)
    desc = os.path.join(ckpt_dir, "t_descriptor", "last.msgpack")
    assert os.path.exists(desc)

    out_dir = str(tmp_path / "exp")
    capsys.readouterr()
    cli.main(["export-descriptors", "--dataset", "modelnet", "--synthetic",
              "--checkpoint", det, "--descriptor-checkpoint", desc,
              "--out", out_dir, "--num-keypoints", "8", "--batch-size", "4",
              "--checkpoints-dir", ckpt_dir] + TINY)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 16
    d = np.fromfile(os.path.join(out_dir, "descriptors", "00", "0.bin"),
                    np.float32)
    assert d.size == 8 * 16

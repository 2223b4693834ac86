"""CLI-level integration: drive the user-facing commands in-process on tiny
synthetic configs (train -> export -> eval roundtrip)."""

import json
import os

import numpy as np

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

    # the export tool's downsample knob (save_keypoints.py:35,116): detect on
    # input_pc_num/rate points with the same checkpoint
    ds_out = str(tmp_path / "kp_ds")
    cli.main(["export-keypoints", "--dataset", "modelnet", "--synthetic",
              "--checkpoint", best, "--out", ds_out,
              "--num-keypoints", "8", "--batch-size", "4",
              "--downsample-rate", "2",
              "--checkpoints-dir", ckpt_dir] + TINY)
    assert len(os.listdir(os.path.join(ds_out, "00"))) == 16

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


def test_cli_detect_arbitrary_clouds(tmp_path, capsys):
    """detect: serve keypoints (+descriptors) for loose .npy clouds — no
    dataset layout, variable input sizes."""
    from usip_tpu.config import get_config
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.descriptor_loop import init_descriptor_state
    from usip_tpu.train.loop import init_detector_state

    cfg = get_config("modelnet", **{
        "data.input_pc_num": 128, "data.node_num": 16,
        "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
        "descriptor.descriptor_len": 16, "descriptor.ball_nsamples": 8,
        "descriptor.ball_radius": 0.6, "descriptor.surface_normal_len": 3})
    _, det = init_detector_state(cfg, 0)
    det_ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(det_ckpt, det)
    _, desc = init_descriptor_state(cfg, 1)
    desc_ckpt = str(tmp_path / "desc.msgpack")
    save_checkpoint(desc_ckpt, desc)

    clouds = tmp_path / "clouds"
    clouds.mkdir()
    rng = np.random.default_rng(0)
    for i, n in enumerate((96, 128, 200)):  # smaller, exact, larger than fixed
        np.save(clouds / f"c{i}.npy",
                rng.normal(size=(n, 3)).astype(np.float32))

    out = tmp_path / "served"
    capsys.readouterr()
    cli.main(["detect", "--dataset", "modelnet", "--input", str(clouds),
              "--checkpoint", det_ckpt, "--descriptor-checkpoint", desc_ckpt,
              "--out", str(out), "--num-keypoints", "8"] + TINY)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clouds"] == 3
    for i in range(3):
        kp = np.fromfile(out / f"c{i}.keypoints.bin", np.float32)
        assert kp.size == 8 * 3
        d = np.fromfile(out / f"c{i}.desc.bin", np.float32).reshape(8, -1)
        assert d.shape[1] == 16
        # rows are L2-normalized; empty-ball keypoints legitimately yield 0
        norms = np.linalg.norm(d, axis=1)
        assert ((np.abs(norms - 1.0) < 1e-2) | (norms < 1e-6)).all()
        assert (np.abs(norms - 1.0) < 1e-2).sum() >= 6


def test_cli_detect_render_gallery(tmp_path, capsys):
    """detect --render --html: keypoint-scene PNGs + index.html gallery (the
    working replacement of the reference's broken oxford/test.py viewer)."""
    from usip_tpu.config import get_config
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.loop import init_detector_state

    cfg = get_config("modelnet", **{
        "data.input_pc_num": 128, "data.node_num": 16,
        "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4})
    _, det = init_detector_state(cfg, 0)
    det_ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(det_ckpt, det)

    clouds = tmp_path / "clouds"
    clouds.mkdir()
    rng = np.random.default_rng(1)
    np.save(clouds / "a.npy", rng.normal(size=(128, 3)).astype(np.float32))

    out = tmp_path / "viz"
    capsys.readouterr()
    cli.main(["detect", "--dataset", "modelnet", "--input", str(clouds),
              "--checkpoint", det_ckpt, "--out", str(out),
              "--num-keypoints", "8", "--render", "--html"] + TINY)
    assert (out / "a.png").stat().st_size > 1000
    html = (out / "index.html").read_text()
    # the link must resolve relative to index.html (the PNG sits next to it)
    assert "src='a.png'" in html


def test_cli_serve_loop(tmp_path):
    """serve: resident JSONL keypoint service — requests stream on stdin, the
    model stays compiled across them; errors don't kill the loop."""
    import subprocess
    import sys as _sys

    from usip_tpu.config import get_config
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.loop import init_detector_state

    cfg = get_config("modelnet", **{
        "data.input_pc_num": 128, "data.node_num": 16,
        "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4})
    _, det = init_detector_state(cfg, 0)
    ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(ckpt, det)
    rng = np.random.default_rng(0)
    clouds = []
    for i in range(2):
        p = str(tmp_path / f"c{i}.npy")
        np.save(p, rng.normal(size=(100 + 30 * i, 3)).astype(np.float32))
        clouds.append(p)

    reqs = "\n".join([
        json.dumps({"id": 1, "input": clouds[0], "out": str(tmp_path / "o")}),
        json.dumps({"id": 2, "input": "/nonexistent.npy"}),
        json.dumps({"id": 3, "input": clouds[1], "out": str(tmp_path / "o"),
                    "num_keypoints": 4}),
        json.dumps({"cmd": "shutdown"}),
    ]) + "\n"
    proc = subprocess.run(
        [_sys.executable, "-m", "usip_tpu.cli", "serve", "--dataset",
         "modelnet", "--checkpoint", ckpt, "--num-keypoints", "8",
         "--platform", "cpu"] + TINY,
        input=reqs, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()
             if l.startswith("{")]
    assert lines[0]["status"] == "ready"
    by_id = {l.get("id"): l for l in lines[1:] if "id" in l}
    assert by_id[1]["n"] == 8
    kp = np.fromfile(by_id[1]["keypoints"], np.float32)
    assert kp.size == 8 * 3
    assert "error" in by_id[2]
    assert by_id[3]["n"] == 4
    assert lines[-1]["status"] == "bye"


def test_build_config_override_beats_flag_default():
    """--override train.num_devices=4 must not be clobbered by the unset
    --num-devices flag defaulting to 1 (review finding)."""
    import argparse

    from usip_tpu.cli import _build_config

    args = argparse.Namespace(
        dataset="kitti", dataroot="", batch_size=None, epochs=None,
        num_devices=1, name="train", checkpoints_dir="checkpoints",
        synthetic=False, override=["train.num_devices=4",
                                   "data.dataroot=/somewhere"],
        profile_dir=None, platform=None)
    cfg = _build_config(args)
    assert cfg.train.num_devices == 4
    assert cfg.data.dataroot == "/somewhere"

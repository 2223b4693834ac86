"""Utils tests: metrics logger, running averages, HTML gallery, vis scenes."""

import json
import os

import numpy as np

from usip_tpu.utils.html import HTMLGallery
from usip_tpu.utils.logging import MetricsLogger, RunningAverages, Throughput
from usip_tpu.utils.vis import axis_equal_3d, plot_pc, save_keypoint_scene


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), "t")
    logger.log(1, 0, {"loss": 1.5}, prefix="train", to_console=False)
    logger.log(2, 0, {"loss": 1.2}, prefix="train", to_console=False)
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "t_metrics.jsonl")]
    assert len(lines) == 2
    assert lines[1]["loss"] == 1.2
    assert lines[0]["step"] == 1


def test_running_averages():
    ra = RunningAverages()
    ra.update({"loss": 2.0}, weight=1)
    ra.update({"loss": 4.0}, weight=3)
    assert ra.averages()["loss"] == 3.5


def test_throughput():
    t = Throughput(2)
    t.add(100)
    assert t.rate() > 0


def test_snapshot_and_scene(tmp_path, rng):
    logger = MetricsLogger(str(tmp_path), "t")
    pc = rng.normal(size=(100, 3))
    path = logger.snapshot_clouds("src", 5, pc=pc, keypoints=pc[:10])
    data = np.load(path)
    np.testing.assert_allclose(data["pc"], pc)

    png = save_keypoint_scene(str(tmp_path / "scene.png"), pc, pc[:10],
                              keypoints=pc[:5],
                              sigmas=rng.uniform(0.1, 1, size=5))
    assert os.path.getsize(png) > 1000


def test_plot_pc_axis(rng):
    ax = plot_pc(rng.normal(size=(50, 3)))
    axis_equal_3d(ax)


def test_html_gallery(tmp_path, rng):
    g = HTMLGallery(str(tmp_path / "web"), title="test <gallery>")
    # create a dummy image
    with open(g.image_path("a.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
    g.add_section("epoch 0", [("a.png", "frame & <kp>")])
    index = g.save()
    content = open(index).read()
    assert "test &lt;gallery&gt;" in content
    assert "images/a.png" in content
    assert "frame &amp; &lt;kp&gt;" in content

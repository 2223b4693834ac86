"""Indoor (3DMatch/Redwood) fragment-registration eval tests: synthetic scenes
with known ground truth, file-format roundtrips, recall/precision math."""

import os

import numpy as np
import pytest

from usip_tpu.eval.indoor import (FragmentRegistration, IndoorEvalResult,
                                  LogEntry, evaluate_scene, evaluate_scenes,
                                  information_matrix, knn_union_matches,
                                  load_info, load_log, load_log_my,
                                  register_fragments, run_scene_registration,
                                  summarize, transformation_error,
                                  write_log_my)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _make_scene(n_frag=4, n_pts=400, n_kp=48, desc_noise=0.01, seed=0):
    """Fragments = overlapping views of one world cloud, each in its own frame.
    Descriptors = world coordinates (+noise) tiled to 9 dims, so matching is
    informative. Returns fragments, gt entries, gt infos."""
    rng = np.random.default_rng(seed)
    world = rng.uniform(-2, 2, size=(n_pts, 3))
    frames = []
    for i in range(n_frag):
        R = _rot_z(rng.uniform(0, 2 * np.pi)) @ _rot_z(0)
        t = rng.uniform(-1, 1, size=3)
        frames.append((R, t))  # world -> frame i: p_i = R @ p_w + t

    # shared world keypoints = repeatable interest points seen by every
    # fragment (each fragment re-detects them in its own frame)
    kp_w = world[rng.choice(n_pts, n_kp, replace=False)]
    fragments = []
    for i, (R, t) in enumerate(frames):
        # each fragment sees an overlapping 80% slice of the world cloud
        sel = rng.choice(n_pts, int(n_pts * 0.8), replace=False)
        pc = world[sel] @ R.T + t
        kp = kp_w @ R.T + t
        desc = np.tile(kp_w, (1, 3)) + rng.normal(scale=desc_noise,
                                                  size=(n_kp, 9))
        fragments.append((pc, kp, desc))

    gt, gt_info = [], []
    for i in range(n_frag):
        for j in range(i + 1, n_frag):
            Ri, ti = frames[i]
            Rj, tj = frames[j]
            M = np.eye(4)   # frame j -> frame i
            M[:3, :3] = Ri @ Rj.T
            M[:3, 3] = ti - Ri @ Rj.T @ tj
            gt.append(LogEntry(i, j, n_frag, M))
            info = information_matrix(fragments[i][1])
            gt_info.append(LogEntry(i, j, n_frag, np.eye(4), information=info))
    return fragments, gt, gt_info


def test_knn_union_matches():
    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(10, 4))
    m = knn_union_matches(d1, d1.copy(), k=1)
    # self-matching: identity pairs must be present
    pairs = {tuple(r) for r in m}
    assert all((i, i) in pairs for i in range(10))


def test_information_matrix_spd():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50, 3))
    info = information_matrix(pts)
    assert info.shape == (6, 6)
    np.testing.assert_allclose(info, info.T, atol=1e-9)
    assert np.all(np.linalg.eigvalsh(info) > 0)
    # single point at origin: A'A has the identity block only
    info0 = information_matrix(np.zeros((1, 3)))
    np.testing.assert_allclose(info0[:3, :3], np.eye(3))
    np.testing.assert_allclose(info0[3:, 3:], 0, atol=1e-12)


def test_transformation_error_zero_and_positive():
    info = information_matrix(np.random.default_rng(2).normal(size=(20, 3)))
    assert transformation_error(np.eye(4), info) == pytest.approx(0.0)
    delta = np.eye(4)
    delta[:3, 3] = [0.3, 0, 0]
    assert transformation_error(delta, info) > 0.04  # 0.3 m >> 0.2 m RMSE


def test_register_fragments_recovers_gt():
    fragments, gt, gt_info = _make_scene(seed=3)
    pc1, kp1, d1 = fragments[0]
    pc2, kp2, d2 = fragments[2]
    reg = register_fragments(pc1, pc2, kp1, d1, kp2, d2, seed=0)
    gt_M = next(e.trans for e in gt if (e.i, e.j) == (0, 2))
    delta = np.linalg.inv(gt_M) @ reg.trans
    info = next(e.information for e in gt_info if (e.i, e.j) == (0, 2))
    assert transformation_error(delta, info) <= 0.04
    assert reg.inlier_ratio > 0.025
    assert reg.ratio_aligned[0] > 0.23 and reg.ratio_aligned[1] > 0.23
    assert reg.information.shape == (6, 6)


def test_scene_pipeline_and_eval(tmp_path):
    """Full synthetic e2e: register all pairs -> gated log -> file roundtrip ->
    recall/precision = 1 on good descriptors."""
    fragments, gt, gt_info = _make_scene(seed=4)
    entries = run_scene_registration(fragments, seed=0)
    assert entries, "no pair passed the gates"

    log_path = os.path.join(tmp_path, "scene.log")
    write_log_my(log_path, entries)
    reread = load_log_my(log_path)
    assert len(reread) == len(entries)
    np.testing.assert_allclose(reread[0].trans, entries[0].trans, atol=1e-9)
    assert reread[0].num_inliers == entries[0].num_inliers

    res = evaluate_scene(reread, gt, gt_info)
    assert res.recall == pytest.approx(1.0)
    assert res.precision == pytest.approx(1.0)
    assert res.false_positives == 0
    assert res.gt_num == 3  # non-adjacent pairs of 4 fragments: 02, 03, 13
    assert np.isfinite(res.inlier_num_mean)


def test_eval_rejects_bad_results():
    """A wrong transform for a gt pair counts against recall and precision."""
    fragments, gt, gt_info = _make_scene(seed=5)
    bad = np.eye(4)
    bad[:3, 3] = [5.0, 5.0, 5.0]
    result = [LogEntry(0, 2, 4, bad, 10, 0.5, np.eye(6))]
    res = evaluate_scene(result, gt, gt_info)
    assert res.recall == 0.0 and res.precision == 0.0
    # a pair absent from gt is a false positive
    result = [LogEntry(0, 3, 4, np.eye(4), 10, 0.5, np.eye(6))]
    res2 = evaluate_scene(result, gt[:1], gt_info[:1])  # gt only has (0,1)
    assert res2.false_positives == 1


def test_empty_result_log_is_zero_recall(tmp_path):
    """A result log with zero entries (every pair gated out) evaluates to
    recall 0 instead of raising a parse error."""
    from usip_tpu.eval.indoor import load_result_log

    log_path = os.path.join(tmp_path, "empty.log")
    write_log_my(log_path, [])
    assert load_result_log(log_path) == []
    _, gt, gt_info = _make_scene(seed=7)
    res = evaluate_scene([], gt, gt_info)
    assert res.recall == 0.0 and res.rs_num == 0 and res.good == 0


def test_loop_evaluation_layout(tmp_path):
    """evaluate_scenes reads the <scene>-evaluation/gt.log+gt.info layout and
    both result-log formats (eval_loop.m / evaluate.m)."""
    fragments, gt, gt_info = _make_scene(seed=6)
    scene = "livingroom1"
    gt_dir = os.path.join(tmp_path, f"{scene}-evaluation")
    os.makedirs(gt_dir)
    # write gt.log / gt.info in the reference text formats
    with open(os.path.join(gt_dir, "gt.log"), "w") as f:
        for e in gt:
            f.write(f"{e.i}\t{e.j}\t{e.n}\n")
            for row in e.trans:
                f.write("\t".join(f"{v:.10f}" for v in row) + "\n")
    with open(os.path.join(gt_dir, "gt.info"), "w") as f:
        for e in gt_info:
            f.write(f"{e.i}\t{e.j}\t{e.n}\n")
            for row in e.information:
                f.write("\t".join(f"{v:.10f}" for v in row) + "\n")

    entries = run_scene_registration(fragments, seed=0)
    log_path = os.path.join(tmp_path, f"{scene}.log")
    write_log_my(log_path, entries)
    per_scene = evaluate_scenes({scene: log_path}, str(tmp_path))
    assert per_scene[scene].recall == pytest.approx(1.0)
    s = summarize(per_scene)
    assert s["mean_recall"] == pytest.approx(1.0)

    # plain-format result log (loop evaluation input) parses too
    plain_path = os.path.join(tmp_path, f"{scene}_plain.log")
    with open(plain_path, "w") as f:
        for e in entries:
            f.write(f"{e.i}\t{e.j}\t{e.n}\n")
            for row in e.trans:
                f.write("\t".join(f"{v:.10f}" for v in row) + "\n")
    per_scene2 = evaluate_scenes({scene: plain_path}, str(tmp_path))
    assert per_scene2[scene].recall == pytest.approx(1.0)


def test_cli_eval_indoor(tmp_path, capsys):
    """CLI e2e: fragment npys + keypoint/descriptor bins + gt on disk ->
    eval-indoor registers, writes logs, reports recall/precision."""
    import json

    from usip_tpu.cli import main

    fragments, gt, gt_info = _make_scene(seed=7)
    scene = "livingroom1"
    pc_root = tmp_path / "pc"
    res_root = tmp_path / "res"
    gt_root = tmp_path / "gt"
    (pc_root / scene).mkdir(parents=True)
    (res_root / scene).mkdir(parents=True)
    gt_dir = gt_root / f"{scene}-evaluation"
    gt_dir.mkdir(parents=True)
    for i, (pc, kp, desc) in enumerate(fragments):
        np.save(pc_root / scene / f"{i}.npy", pc.astype(np.float32))
        rows = np.concatenate([kp, desc], axis=1).astype(np.float32)
        rows.tofile(res_root / scene / f"{i}.bin")
    with open(gt_dir / "gt.log", "w") as f:
        for e in gt:
            f.write(f"{e.i}\t{e.j}\t{e.n}\n")
            for row in e.trans:
                f.write("\t".join(f"{v:.10f}" for v in row) + "\n")
    with open(gt_dir / "gt.info", "w") as f:
        for e in gt_info:
            f.write(f"{e.i}\t{e.j}\t{e.n}\n")
            for row in e.information:
                f.write("\t".join(f"{v:.10f}" for v in row) + "\n")

    main(["eval-indoor", "--gt-root", str(gt_root), "--scenes", scene,
          "--pc-root", str(pc_root), "--result-root", str(res_root),
          "--out", str(tmp_path / "logs"), "--desc-dim", "9",
          "--overlapped-only"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    per_scene = lines[0]
    assert per_scene["scene"] == scene
    assert per_scene["recall"] == pytest.approx(1.0)
    assert lines[-1]["mean_recall"] == pytest.approx(1.0)
    assert (tmp_path / "logs" / f"{scene}.log").exists()

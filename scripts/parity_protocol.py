"""North-star parity: one trained full-scale checkpoint through BOTH complete
repeatability pipelines on the same synthetic KITTI test frames.

Arm A (this framework): `run_export` (jitted detect -> sigma top-K ->
per-frame .bin) + `run_repeatability` with the cam->velodyne coord fix —
the protocol of evaluation/save_keypoints.py:229-414 + eval_rep.m:142-153.

Arm B (the reference's own code): the reference `RPN_Detector` source
executed on CPU through the pure-torch extension shims
(train/reference_runtime.py) with the SAME checkpoint weights, the
reference's own host FPS node sampling (kitti_test_loader.py:74-131: FPS
over a random 1/4 subsample, random start), and the reference's own
AST-extracted export post-processing (nms + sigma argsort + count
enforcement, save_keypoints.py:180-227,343-351) writing its .bin layout —
then the same repeatability evaluation.

BASELINE.md's second clause is "repeatability within 1% of the reference";
this records the two numbers side by side. Run:

  python scripts/parity_protocol.py --root /tmp/synth_kitti [--frames 24]

Heavy: the reference forward at (16384 pts, 512 nodes, c1=128/c2=512) costs
seconds per frame on one CPU core; --frames bounds the pair subset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def reference_fps(rng, pts: np.ndarray, k: int) -> np.ndarray:
    """The reference eval loader's FarthestSampler.sample
    (kitti_test_loader.py:74-88): random start, argmax-of-min-distance."""
    out = np.zeros((k, 3))
    out[0] = pts[rng.integers(len(pts))]
    d = ((out[0] - pts) ** 2).sum(axis=1)
    for i in range(1, k):
        out[i] = pts[np.argmax(d)]
        d = np.minimum(d, ((out[i] - pts) ** 2).sum(axis=1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_kitti")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--checkpoint", default=None,
                    help="detector checkpoint (default: the fullscale best)")
    ap.add_argument("--frames", type=int, default=None,
                    help="cap the number of exported frames per arm "
                         "(reference-arm CPU cost; default: all)")
    ap.add_argument("--desired", type=int, default=128)
    ap.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"])
    ap.add_argument("--ref-seeds", default="0",
                    help="comma-separated rng seeds for the reference arm's "
                         "stochastic node sampling (random-quarter subsample "
                         "+ random FPS start, kitti_test_loader.py:74-131). "
                         "Multiple seeds measure the reference protocol's "
                         "own run-to-run spread — the scale against which "
                         "the cross-framework |delta| must be read.")
    ap.add_argument("--skip-ours", action="store_true",
                    help="reuse an existing Arm-A export (parity_ours/)")
    ap.add_argument("--ref-nodes", default="reference",
                    choices=["reference", "full", "eighth"],
                    help="'reference': the reference loader's node protocol "
                         "(FPS over a random quarter subsample); 'full': FPS "
                         "over the whole cloud; 'eighth': FPS over a random "
                         "1/8 subsample (this framework's shipped "
                         "fps_subsample_ratio=8 recipe) — isolates "
                         "network/export parity from the node-sampling "
                         "protocol difference")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import torch

    from usip_tpu.config import get_config
    from usip_tpu.data.eval_loaders import KittiTestFrames
    from usip_tpu.eval.eval_runner import (load_kitti_gt_table, make_coord_fix,
                                           run_repeatability)
    from usip_tpu.eval.export_runner import run_export
    from usip_tpu.train import reference_runtime as rr
    from usip_tpu.train.checkpoint import restore_checkpoint
    from usip_tpu.train.loop import init_detector_state

    torch.set_num_threads(os.cpu_count() or 1)

    ckpt = args.checkpoint or os.path.join(args.root, "ckpt", "fullscale",
                                           "best.msgpack")
    # the parity-exact inference path: fp32 trunk, exact FPS — the reference
    # arm is fp32 torch, so the bf16 default would blur the comparison
    cfg = get_config("kitti", **{
        "data.dataroot": args.root, "train.batch_size": 4,
        "train.name": "parity", "detector.compute_dtype": "float32",
        "data.fps_parallel": 1})
    sn_len = cfg.detector.surface_normal_len

    gt = []
    for seq in (9, 10):
        gt.extend(load_kitti_gt_table(
            os.path.join(args.root, "kitti-reg-test"), seq))
    fix = make_coord_fix("kitti",
                         os.path.join(args.root, "calib"))

    def make_ds():
        return KittiTestFrames(
            cfg.data,
            txt_root=os.path.join(args.root, "kitti-reg-test"),
            numpy_root=os.path.join(args.root, "data_odometry_velodyne",
                                    "numpy"),
            seqs=(9, 10), sn_len=sn_len, seed=0)

    needed = None
    if args.frames:
        # keep whole pairs: every frame referenced by the first gt pairs
        keep_pairs = gt[:args.frames // 2]
        needed = {(g["seq"], g["anc_idx"]) for g in keep_pairs} \
            | {(g["seq"], g["pos_idx"]) for g in keep_pairs}
        gt = keep_pairs

    class _Subset:
        """Restrict the eval set to the frames the kept gt pairs reference."""

        def __init__(self, base):
            self.base = base
            self.idx = [
                i for i in range(len(base))
                if (int(base.items[i]["seq"]),
                    int(base.items[i]["anc_idx"])) in needed]

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, j):
            return self.base[self.idx[j]]

    # ---------------- Arm A: this framework end to end -------------------
    out_a = os.path.join(args.root, "parity_ours")
    if args.skip_ours:
        rep_a, arr_a = run_repeatability(out_a, out_a, gt, inlier_radius=0.5,
                                         coord_fix=fix)
        print(json.dumps({"arm": "ours", "reused": True,
                          "repeatability": float(rep_a),
                          "pairs": len(arr_a)}), flush=True)
    else:
        ds_a = make_ds()
        if needed is not None:
            ds_a = _Subset(ds_a)
        t0 = time.perf_counter()
        stats_a = run_export(cfg, ckpt, out_a, desired_num=args.desired,
                             dataset=ds_a)
        rep_a, arr_a = run_repeatability(out_a, out_a, gt, inlier_radius=0.5,
                                         coord_fix=fix)
        t_a = time.perf_counter() - t0
        print(json.dumps({"arm": "ours", "frames": stats_a["frames"],
                          "repeatability": float(rep_a), "pairs": len(arr_a),
                          "seconds": round(t_a, 1)}), flush=True)

    # ---------------- Arm B: the reference source end to end --------------
    _, state = init_detector_state(cfg, seed=0)
    state, _ = restore_checkpoint(ckpt, state)
    variables = state.variables
    net = rr.build_reference_detector(cfg, args.reference, variables)
    ref_nms, ref_ensure = rr.load_reference_export_fns(args.reference)

    reps_b = []
    for seed in [int(s) for s in args.ref_seeds.split(",")]:
        out_b = os.path.join(args.root,
                             f"parity_ref_{args.ref_nodes}_s{seed}")
        ds_b = make_ds()
        if needed is not None:
            ds_b = _Subset(ds_b)
        rng = np.random.default_rng(seed)
        t0 = time.perf_counter()
        frames_b = 0
        for j in range(len(ds_b)):
            item = ds_b[j]
            pc, sn = item["pc"], item["sn"]
            if args.ref_nodes == "reference":
                node_src = pc[rng.choice(pc.shape[0], pc.shape[0] // 4,
                                         replace=False)]
            elif args.ref_nodes == "eighth":
                node_src = pc[rng.choice(pc.shape[0], pc.shape[0] // 8,
                                         replace=False)]
            else:
                node_src = pc
            node = reference_fps(rng, node_src,
                                 cfg.data.node_num).astype(np.float32)
            with torch.no_grad():
                _, r_kp, r_sig, _ = net(
                    torch.as_tensor(pc.T[None]), torch.as_tensor(sn.T[None]),
                    torch.as_tensor(node.T[None]), is_train=False, epoch=None)
            kp = r_kp.numpy()[0].T
            sig = r_sig.numpy()[0]
            # the reference export post-processing, nms_threshold=0 == pure
            # sigma ranking (save_keypoints.py:343-351 with the kitti settings)
            order = np.argsort(sig)[:args.desired]
            sel = kp[order]
            sel = ref_ensure(sel, pc, args.desired)
            path = os.path.join(out_b, f"{int(item['seq']):02d}",
                                f"{int(item['frame'])}.bin")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            sel.astype(np.float32).tofile(path)
            frames_b += 1
            if frames_b % 24 == 0:
                print(f"[ref s{seed}] {frames_b}/{len(ds_b)} frames "
                      f"({(time.perf_counter() - t0) / frames_b:.1f} s/frame)",
                      flush=True)
        rep_b, arr_b = run_repeatability(out_b, out_b, gt, inlier_radius=0.5,
                                         coord_fix=fix)
        t_b = time.perf_counter() - t0
        reps_b.append(float(rep_b))
        print(json.dumps({"arm": "reference", "seed": seed,
                          "frames": frames_b,
                          "repeatability": float(rep_b), "pairs": len(arr_b),
                          "seconds": round(t_b, 1)}), flush=True)

    rep_b = float(np.mean(reps_b))
    delta = abs(float(rep_a) - rep_b)
    spread = float(np.max(reps_b) - np.min(reps_b)) if len(reps_b) > 1 else None
    # the within-1pt verdict is named for the protocol it was measured
    # against: a non-default --ref-nodes arm (e.g. 'eighth', the
    # protocol-matched control) must not read as the reference's shipped
    # 1/4-subsample recipe (~2 pt apart at kitti scale, PARITY.md round 4)
    verdict_key = ("within_1pt_vs_shipped_ref_protocol"
                   if args.ref_nodes == "reference"
                   else f"within_1pt_vs_{args.ref_nodes}_protocol")
    print(json.dumps({"phase": "parity", "ref_nodes": args.ref_nodes,
                      "ours": float(rep_a), "reference_mean": rep_b,
                      "reference_runs": reps_b,
                      "reference_spread": spread,
                      "abs_delta": delta, "pairs": len(arr_a),
                      verdict_key: bool(delta <= 0.01 + 1e-9)}))


if __name__ == "__main__":
    main()

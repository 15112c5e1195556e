"""TAP-Vid benchmark runner: track every sequence, write prediction pickles.

Role parity with reference MFT/runners/run_MFT_tapvid.py:86-316:
per sequence x query_mode x start_frame x direction, track with the MFT
tracker, sample the query tracks, scale predictions to the 256x256 metric
raster and write ``{seq}-{mode}.pklz`` files with {'tracks', 'occluded'}.
Per-sequence flow caches make repeated (start_frame, direction) passes reuse
pairwise flows. ``--cont`` resumes by skipping existing result files.
"""

import argparse
import logging
import pickle
import shutil
import sys
from pathlib import Path

import numpy as np

from mft_tpu.config import load_config
from mft_tpu.eval.tapvid import create_tapvid_dataset
from mft_tpu.io.cache import FlowCache
from mft_tpu.tracker.point_tracking import (
    convert_to_point_tracking, convert_to_point_tracking_batch)
from mft_tpu.utils.repro import code_export

logger = logging.getLogger(__name__)


def track_sequence(tracker, video, start_frame, direction="forward",
                   flow_cache=None, chunk=8):
    """Track from ``start_frame`` to the video end (or start, if backward).

    Frames are fed ``chunk`` at a time through ``tracker.track_chunk`` —
    on a cold flow cache that is one device dispatch per chunk (with
    in-graph pairwise write-back rows) instead of ~22 per frame; the
    tracker falls back to per-frame tracking by itself whenever the cache
    holds hits or the fused path is unavailable.

    returns: {frame_i: meta} with meta.result a FlowOU (template->frame_i).
    Reference parity: run_MFT_tapvid.py:251-285.
    """
    time_direction = 1 if direction == "forward" else -1
    metas = {start_frame: tracker.init(video[start_frame],
                                       start_frame_i=start_frame,
                                       time_direction=time_direction,
                                       flow_cache=flow_cache)}
    frame_is = (list(range(start_frame + 1, len(video)))
                if time_direction > 0
                else list(range(start_frame - 1, -1, -1)))
    for s in range(0, len(frame_is), chunk):
        idxs = frame_is[s:s + chunk]
        for fi, meta in zip(idxs,
                            tracker.track_chunk([video[i] for i in idxs])):
            metas[fi] = meta
    return metas


def _flow_identity(cfg):
    """Everything that changes the pairwise flows a config produces.

    Pairwise flows are cached per sequence and shared across tracker
    configs (reference validates the same, run_MFT_tapvid.py:303-306);
    the per-delta iteration schedule changes effective flow quality, so it
    is part of the identity alongside the flow config itself.
    """
    def stable(v):
        # dict repr is insertion-order dependent; two semantically identical
        # raft_params written in different key order must compare equal
        if hasattr(v, "items"):
            return repr(sorted((str(k), stable(x)) for k, x in v.items()))
        return repr(v)

    def norm_sched(s):
        # mirror MFT._iters_schedule's matching semantics so the identity
        # compares SCHEDULES, not spellings: numeric keys by value (1 == 1.0),
        # the 'inf' string as infinity, other string keys never match and are
        # dropped. Sequence form stays positional — deltas are part of the
        # identity below, so equal lists imply equal per-delta counts.
        if not s:
            return None
        if hasattr(s, "items"):
            out = []
            for k, v in s.items():
                if isinstance(k, str):
                    if k == "inf":
                        out.append((float("inf"), int(v)))
                else:
                    out.append((float(k), int(v)))
            return tuple(sorted(out))
        return tuple(int(i) for i in s)

    fc = cfg.flow_config
    return (str(fc.model or None), int(fc.flow_iters or 12),
            stable(fc.raft_params or None),
            tuple(sorted(float(d) for d in cfg.deltas)),
            norm_sched(cfg.flow_iters_schedule or None),
            # warm-started template flows depend on tracking history, so
            # the mode is part of what a cached pairwise flow means
            bool(cfg.warm_start_inf))


def run(args):
    configs = [load_config(p) for p in args.trackers]
    config = configs[0]
    for cfg in configs:
        # the runner swaps tracker.C per config WITHOUT re-running
        # MFT.__init__, so its config invariant must be checked here for
        # every config (see MFT.__init__)
        if cfg.warm_start_inf and cfg.cache_delta_infinity:
            raise ValueError(
                f"config {cfg.name}: warm_start_inf and cache_delta_infinity "
                "cannot be combined (warm-started template flows depend on "
                "tracking history and are not reusable cache entries)")
    for cfg in configs[1:]:
        if _flow_identity(cfg) != _flow_identity(config):
            raise ValueError(
                "all tracker configs of one run must share the same flow "
                "setup (model, iters, raft_params, iteration schedule): "
                "pairwise flows are cached per sequence and reused across "
                f"configs. {cfg.name} differs from {config.name}.")
    tracker = config.tracker_class(config)
    dataset_conf = load_config(args.dataset)

    export_root = Path(args.export)
    for cfg in configs:
        result_dir = export_root / cfg.name / "results"
        result_dir.mkdir(parents=True, exist_ok=True)
        code_export(export_root / cfg.name / "code")

    query_modes = ["first", "strided"] if args.mode == "both" else [args.mode]

    for pickle_path in dataset_conf.pickles:
        dataset = create_tapvid_dataset(pickle_path, query_modes,
                                        dataset_conf.scaling)
        for seq in dataset:
            name = seq["video_name"]
            if args.seq and name not in args.seq:
                continue
            video = seq["data"][query_modes[0]]["video"][0]
            video = np.ascontiguousarray(video[..., ::-1])  # RGB -> BGR

            cache_dir = Path(args.cache) / (dataset_conf.name or "ds") / name
            shutil.rmtree(cache_dir, ignore_errors=True)
            flow_cache = FlowCache(cache_dir, max_ram_mb=args.ram_cache_limit * 1e3,
                                   max_device_mb=args.device_cache_limit * 1e3)

            for query_mode in query_modes:
                gt = seq["data"][query_mode]
                query_points = gt["query_points"][0].astype(np.int64)  # (N, tyx)
                start_frames = np.unique(query_points[:, 0])
                N_queries, N_frames = query_points.shape[0], video.shape[0]

                for cfg in configs:
                    tracker.C = cfg  # runner-level config monkeypatch
                    out_path = (export_root / cfg.name / "results"
                                / f"{name}-{query_mode}.pklz")
                    if args.cont and out_path.exists():
                        logger.info("skipping %s (already computed)", out_path.name)
                        continue
                    pred_occluded = np.zeros((N_queries, N_frames))
                    pred_tracks = np.zeros((N_queries, N_frames, 2))

                    for start_frame in start_frames:
                        mask = query_points[:, 0] == start_frame
                        queries = query_points[mask, 1:][:, ::-1].astype(np.float32)  # yx -> xy

                        directions = ["forward"]
                        if query_mode == "strided":
                            directions.append("backward")
                        for direction in directions:
                            metas = track_sequence(tracker, video, int(start_frame),
                                                   direction, flow_cache)
                            frame_gen = (range(int(start_frame), N_frames)
                                         if direction == "forward"
                                         else range(int(start_frame), -1, -1))
                            # batched conversion: one sample dispatch + one
                            # host fetch per group instead of per frame
                            frame_list = list(frame_gen)
                            for g in range(0, len(frame_list), 64):
                                idxs = frame_list[g:g + 64]
                                coords, occl = convert_to_point_tracking_batch(
                                    [metas[i].result for i in idxs], queries)
                                for j, fi in enumerate(idxs):
                                    pred_tracks[mask, fi, :] = coords[j]
                                    pred_occluded[mask, fi] = occl[j]

                            # optional dense flowou export from the template
                            # frame (reference run_MFT_tapvid.py:210-217)
                            if (args.write_flow and start_frame == 0
                                    and query_mode == "first"
                                    and direction == "forward"):
                                flowou_dir = (export_root / cfg.name
                                              / "flowous" / name)
                                flowou_dir.mkdir(parents=True, exist_ok=True)
                                for frame_i in frame_gen:
                                    from mft_tpu.core.flowou import FlowOU
                                    r = metas[frame_i].result
                                    FlowOU(r.flow, r.occlusion, r.sigma).write(
                                        flowou_dir
                                        / f"0--{frame_i}.flowouX16.pkl")

                    H, W = video.shape[1], video.shape[2]
                    scale = np.array([256.0 / W, 256.0 / H]).reshape(1, 1, 1, 2)
                    out = {"tracks": pred_tracks[None] * scale,
                           "occluded": pred_occluded[None]}
                    with open(out_path, "wb") as f:
                        pickle.dump(out, f)
                    logger.info("wrote %s", out_path)

            shutil.rmtree(cache_dir, ignore_errors=True)
            flow_cache.clear()
    return 0


def get_parser():
    parser = argparse.ArgumentParser(description="run MFT on TAP-Vid")
    parser.add_argument("--trackers", nargs="+",
                        default=["configs/MFT_cfg.py"])
    parser.add_argument("--dataset",
                        default="dataset_configs/tapvid_davis_256x256_512x512.py")
    parser.add_argument("--export", default="export")
    parser.add_argument("--cache", default="flow_cache")
    parser.add_argument("--mode", choices=["first", "strided", "both"],
                        default="both")
    parser.add_argument("--seq", nargs="*", default=None)
    parser.add_argument("--cont", action="store_true",
                        help="skip sequences with existing results")
    parser.add_argument("--write_flow", action="store_true",
                        help="also export dense template->frame flowou files")
    parser.add_argument("--ram_cache_limit", type=float, default=10,
                        help="GB of host RAM for the flow cache")
    parser.add_argument("--device_cache_limit", type=float, default=5,
                        help="GB of device HBM for the flow cache")
    return parser


def _main():
    logging.basicConfig(level=logging.INFO)
    sys.exit(run(get_parser().parse_args()))



def main():
    import os
    from mft_tpu.utils.various import with_debugger
    entry = _main if not os.environ.get("MFT_TPU_DEBUG") else with_debugger(_main)
    entry()


if __name__ == "__main__":
    main()

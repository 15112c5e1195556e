"""TAP-Vid metrics: occlusion accuracy, <delta^x positions, Jaccard, AJ.

Fresh vectorized implementation of the TAP-Vid benchmark metrics (protocol
defined in the TAP-Vid paper; semantics matched against the reference's
Apache-2.0 evaluation code, MFT/evaluation/tapvid_eval_stuff.py:82-237,
including the FP/FN/TP/TN and precision extras).

All positions are in the 256x256 raster convention. Metrics are per-video
(batch dim preserved); benchmark numbers are means over videos, x100.
"""

import numpy as np

THRESHOLDS = (1, 2, 4, 8, 16)


def compute_tapvid_metrics(query_points, gt_occluded, gt_tracks,
                           pred_occluded, pred_tracks, query_mode):
    """args:
      query_points: (B, N, 3) [t, y, x] query coordinates.
      gt_occluded, pred_occluded: (B, N, T) bool, True = occluded.
      gt_tracks, pred_tracks: (B, N, T, 2) [x, y] positions @256x256 scale.
      query_mode: 'first' or 'strided'.

    returns: dict of per-video arrays (shape (B,)) with keys
      occlusion_accuracy, occlusion_{FP,FN,TP,TN}, pts_within_{t},
      prec_at_{t}, jaccard_{t} for t in {1,2,4,8,16}, average_jaccard,
      average_pts_within_thresh, average_prec.
    """
    query_points = np.asarray(query_points)
    gt_occluded = np.asarray(gt_occluded, bool)
    gt_tracks = np.asarray(gt_tracks)
    pred_occluded = np.asarray(pred_occluded, bool)
    pred_tracks = np.asarray(pred_tracks)
    B, N, T = gt_occluded.shape

    # evaluation mask: everything except the query frame itself...
    q_frame = np.round(query_points[..., 0]).astype(np.int32)  # (B, N)
    eval_pts = np.ones((B, N, T), bool)
    np.put_along_axis(eval_pts, q_frame[..., None], False, axis=2)
    # ...and the official 'first'-mode pre-query masking. NB: the official
    # TAP-Vid code (and the reference verbatim, tapvid_eval_stuff.py:146-152)
    # indexes np.where(~gt_occluded[b])[0][0] on the (N, T) array — i.e. it
    # masks whole TRACKS before the first track with any visible frame, which
    # is a no-op when queries were sampled at visible frames. We replicate it
    # exactly so benchmark numbers are bit-identical to the protocol.
    if query_mode == "first":
        for b in range(B):
            index = np.where(~gt_occluded[b])[0][0]
            eval_pts[b, :index] = False
    elif query_mode != "strided":
        raise ValueError(f"unknown query mode {query_mode}")

    out = {}
    n_eval = np.sum(eval_pts)
    out["occlusion_accuracy"] = np.sum(
        (pred_occluded == gt_occluded) & eval_pts, axis=(1, 2)) / n_eval
    out["occlusion_FP"] = np.sum(pred_occluded & ~gt_occluded & eval_pts, axis=(1, 2))
    out["occlusion_FN"] = np.sum(~pred_occluded & gt_occluded & eval_pts, axis=(1, 2))
    out["occlusion_TP"] = np.sum(pred_occluded & gt_occluded & eval_pts, axis=(1, 2))
    out["occlusion_TN"] = np.sum(~pred_occluded & ~gt_occluded & eval_pts, axis=(1, 2))

    visible = ~gt_occluded
    pred_visible = ~pred_occluded
    sq_dist = np.sum(np.square(pred_tracks - gt_tracks), axis=-1)  # (B, N, T)
    gt_visible_count = np.sum(visible & eval_pts, axis=(1, 2))

    frac_list, jac_list, prec_list = [], [], []
    for thresh in THRESHOLDS:
        within = sq_dist < thresh ** 2
        correct = within & visible

        frac = np.sum(correct & eval_pts, axis=(1, 2)) / gt_visible_count
        out[f"pts_within_{thresh}"] = frac
        frac_list.append(frac)

        tp = np.sum(correct & pred_visible & eval_pts, axis=(1, 2))
        prec = tp / np.sum(pred_visible & visible & eval_pts, axis=(1, 2))
        out[f"prec_at_{thresh}"] = prec
        prec_list.append(prec)

        # Jaccard denominator: GT-visible points + false positives, where a
        # false positive is predicted-visible but GT-occluded or too far off.
        fp = np.sum(((~visible | ~within) & pred_visible) & eval_pts, axis=(1, 2))
        jac = tp / (gt_visible_count + fp)
        out[f"jaccard_{thresh}"] = jac
        jac_list.append(jac)

    out["average_jaccard"] = np.mean(np.stack(jac_list, axis=1), axis=1)
    out["average_pts_within_thresh"] = np.mean(np.stack(frac_list, axis=1), axis=1)
    out["average_prec"] = np.mean(np.stack(prec_list, axis=1), axis=1)
    return out

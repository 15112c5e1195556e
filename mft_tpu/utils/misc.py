"""Small shared helpers (scale-string parsing, pair generation, conversions).

Reference parity: MFT/utils/misc.py.
"""

import numpy as np


def ensure_numpy(x):
    """Convert jax/torch arrays to numpy; pass numpy through."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "device_buffer") or type(x).__module__.startswith("jax"):
        return np.asarray(x)
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def parse_scale_WH(scale_WH: str, frames_shape: dict):
    """Parse a resolution string into a list of {'W','H',...} dicts.

    Grammar (reference MFT/utils/misc.py:65-92): '_'-separated stages, each
    either 'fullres', 'WxH', 'Wx' (keep aspect), or 'xH' (keep aspect). Each
    stage's missing dimension is computed from the ORIGINAL frame shape's
    aspect ratio, e.g. '256x256_512x512' resizes to 256x256 then 512x512.
    """
    if scale_WH == "fullres":
        return [frames_shape]
    out = []
    for stage in scale_WH.split("_"):
        if stage == "fullres":
            out.append(frames_shape)
            continue
        new_shape = dict(frames_shape.items())
        w_str, h_str = stage.split("x")
        W = int(w_str) if w_str != "" else None
        H = int(h_str) if h_str != "" else None
        assert W is not None or H is not None, "at least one dimension must be set"
        new_shape["W"] = W if W is not None else int(round(frames_shape["W"] * (H / frames_shape["H"])))
        new_shape["H"] = H if H is not None else int(round(frames_shape["H"] * (W / frames_shape["W"])))
        out.append(new_shape)
    return out


def make_pairs(xs):
    """Consecutive pairs [(x0, x1), (x1, x2), ...]."""
    return list(zip(xs[:-1], xs[1:]))


def make_delta_pairs(xs, delta=1):
    """Pairs ``(xs[i], xs[i+delta])`` with indices, skipping out-of-range.

    Yields (left_i, left, right_i, right), matching reference
    MFT/utils/misc.py:37-62 semantics.
    """
    for i, x in enumerate(xs):
        left_i = i - delta
        if left_i < 0:
            continue
        yield (left_i, xs[left_i], i, x)


def trim_string(x, max_len, end="..."):
    assert len(end) < max_len
    if len(x) > max_len:
        x = x[: max_len - len(end)] + end
    return x

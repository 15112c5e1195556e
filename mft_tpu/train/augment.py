"""Training-time augmentation for flow+occlusion data (host-side numpy).

Role parity with reference MFT/RAFT/core/utils/augmentor.py: photometric
jitter (symmetric/asymmetric), eraser occlusion, random scale/stretch/flip,
random crop with flow scaling, out-of-frame occlusion marking, and the
sparse-flow-aware variant for KITTI/HD1K. Parameter ranges match the
reference; RNG streams are our own (augmentation is stochastic by design).
"""

import numpy as np
import cv2


def _adjust_photometric(img, rng, brightness=0.4, contrast=0.4,
                        saturation=0.4, hue=0.5 / 3.14):
    """torchvision-ColorJitter-style photometric jitter on uint8 RGB."""
    out = img.astype(np.float32)
    # brightness
    out = out * rng.uniform(1 - brightness, 1 + brightness)
    # contrast
    mean = out.mean()
    out = (out - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    # saturation
    gray = out.mean(axis=2, keepdims=True)
    out = (out - gray) * rng.uniform(1 - saturation, 1 + saturation) + gray
    # hue: rotate channels in HSV
    out = np.clip(out, 0, 255).astype(np.uint8)
    hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV).astype(np.int32)
    hsv[..., 0] = (hsv[..., 0] + int(rng.uniform(-hue, hue) * 180)) % 180
    out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return out


class FlowAugmenter:
    """Dense-flow augmentation (reference augmentor.py:157-324)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip=True, load_occlusion=False, asymmetric_color_aug_prob=0.2,
                 spatial_aug_prob=0.8, eraser_aug_prob=0.5, stretch_prob=0.8,
                 max_stretch=0.2, h_flip_prob=0.5, v_flip_prob=0.1,
                 out_of_frame_occlusion=True, seed=None):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.do_flip = do_flip
        self.load_occlusion = load_occlusion
        self.asymmetric_color_aug_prob = asymmetric_color_aug_prob
        self.spatial_aug_prob = spatial_aug_prob
        self.eraser_aug_prob = eraser_aug_prob
        self.stretch_prob = stretch_prob
        self.max_stretch = max_stretch
        self.h_flip_prob = h_flip_prob
        self.v_flip_prob = v_flip_prob
        self.out_of_frame_occlusion = out_of_frame_occlusion
        self.rng = np.random.default_rng(seed)

    # -- photometric -------------------------------------------------------
    def color_transform(self, img1, img2):
        if self.rng.uniform() < self.asymmetric_color_aug_prob:
            return (_adjust_photometric(img1, self.rng),
                    _adjust_photometric(img2, self.rng))
        stacked = np.concatenate([img1, img2], axis=0)
        stacked = _adjust_photometric(stacked, self.rng)
        return np.split(stacked, 2, axis=0)

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        """Occlusion simulation: rectangles of img2 -> its mean color."""
        H, W = img1.shape[:2]
        if self.rng.uniform() < self.eraser_aug_prob:
            mean_color = img2.reshape(-1, 3).mean(axis=0)
            for _ in range(self.rng.integers(1, 3)):
                x0 = int(self.rng.uniform(0, W))
                y0 = int(self.rng.uniform(0, H))
                dx = int(self.rng.uniform(*bounds))
                dy = int(self.rng.uniform(*bounds))
                img2[y0:y0 + dy, x0:x0 + dx] = mean_color
        return img1, img2

    # -- spatial -----------------------------------------------------------
    def spatial_transform(self, img1, img2, flow, occl):
        H, W = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 8) / H, (self.crop_size[1] + 8) / W)
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if self.rng.uniform() < self.stretch_prob:
            scale_x *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
            scale_y *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
        scale_x = max(scale_x, min_scale)
        scale_y = max(scale_y, min_scale)

        if self.rng.uniform() < self.spatial_aug_prob:
            new_wh = (int(round(W * scale_x)), int(round(H * scale_y)))
            img1 = cv2.resize(img1, new_wh, interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, new_wh, interpolation=cv2.INTER_LINEAR)
            flow = cv2.resize(flow, new_wh, interpolation=cv2.INTER_LINEAR)
            flow = flow * np.array([scale_x, scale_y], np.float32)
            if occl is not None:
                occl = cv2.resize(occl, new_wh, interpolation=cv2.INTER_LINEAR)

        if self.do_flip:
            if self.rng.uniform() < self.h_flip_prob:
                img1 = img1[:, ::-1]
                img2 = img2[:, ::-1]
                flow = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
                occl = occl[:, ::-1] if occl is not None else None
            if self.rng.uniform() < self.v_flip_prob:
                img1 = img1[::-1]
                img2 = img2[::-1]
                flow = flow[::-1] * np.array([1.0, -1.0], np.float32)
                occl = occl[::-1] if occl is not None else None

        H2, W2 = img1.shape[:2]
        y0 = self.rng.integers(0, H2 - self.crop_size[0] + 1)
        x0 = self.rng.integers(0, W2 - self.crop_size[1] + 1)
        sl = (slice(y0, y0 + self.crop_size[0]), slice(x0, x0 + self.crop_size[1]))
        img1, img2, flow = img1[sl], img2[sl], flow[sl]
        occl = occl[sl] if occl is not None else None
        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow),
                np.ascontiguousarray(occl) if occl is not None else None)

    @staticmethod
    def mark_out_of_frame_occluded(flow, occl):
        """Pixels whose flow endpoint leaves the crop become occluded
        (reference augmentor.py:292-302)."""
        H, W = flow.shape[:2]
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        ex = xs + flow[..., 0]
        ey = ys + flow[..., 1]
        oof = (ex < 0) | (ey < 0) | (ex >= W) | (ey >= H)
        occl = occl.copy()
        occl[oof] = 1.0
        return occl

    def __call__(self, img1, img2, flow, valid=None, occl=None):
        """returns (img1, img2, flow, valid, occl), all channel-last numpy."""
        occl2d = occl[..., 0] if (occl is not None and occl.ndim == 3) else occl
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, occl2d = self.spatial_transform(img1, img2, flow, occl2d)
        if occl2d is not None and self.out_of_frame_occlusion:
            occl2d = self.mark_out_of_frame_occluded(flow, occl2d)
        valid = ((np.abs(flow[..., 0]) < 1000)
                 & (np.abs(flow[..., 1]) < 1000)).astype(np.float32)
        occl_out = occl2d[..., None] if occl2d is not None else None
        return img1, img2, flow, valid, occl_out


class SparseFlowAugmenter:
    """Sparse-flow (KITTI/HD1K) augmentation with validity-aware resize.

    Reference parity: augmentor.py:327-501 — sparse flow maps are resized by
    scattering the valid flow vectors into the resized grid instead of
    interpolating across invalid holes (resize_sparse_flow_map, :393).
    """

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False,
                 load_occlusion=False, seed=None):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.do_flip = do_flip
        self.rng = np.random.default_rng(seed)
        self.spatial_aug_prob = 0.8
        self.h_flip_prob = 0.5
        self.eraser_aug_prob = 0.5
        self._dense = FlowAugmenter(crop_size, seed=seed)
        self._dense.rng = self.rng

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx, fy):
        H, W = flow.shape[:2]
        Ho, Wo = int(round(H * fy)), int(round(W * fx))
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        v = valid > 0.5
        pts_x = xs[v] * fx
        pts_y = ys[v] * fy
        fl = flow[v] * np.array([fx, fy], np.float32)
        xi = np.round(pts_x).astype(np.int32)
        yi = np.round(pts_y).astype(np.int32)
        keep = (xi >= 0) & (xi < Wo) & (yi >= 0) & (yi < Ho)
        out_flow = np.zeros((Ho, Wo, 2), np.float32)
        out_valid = np.zeros((Ho, Wo), np.float32)
        out_flow[yi[keep], xi[keep]] = fl[keep]
        out_valid[yi[keep], xi[keep]] = 1.0
        return out_flow, out_valid

    def __call__(self, img1, img2, flow, valid=None, occl=None):
        if valid is None:
            valid = np.ones(flow.shape[:2], np.float32)
        if valid.ndim == 3:
            valid = valid[..., 0]
        img1, img2 = self._dense.color_transform(img1, img2)
        img1, img2 = self._dense.eraser_transform(img1, img2)

        H, W = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 1) / H, (self.crop_size[1] + 1) / W)
        scale = max(2 ** self.rng.uniform(self.min_scale, self.max_scale),
                    min_scale)
        if self.rng.uniform() < self.spatial_aug_prob:
            new_wh = (int(round(W * scale)), int(round(H * scale)))
            img1 = cv2.resize(img1, new_wh, interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, new_wh, interpolation=cv2.INTER_LINEAR)
            flow, valid = self.resize_sparse_flow_map(flow, valid, scale, scale)

        if self.do_flip and self.rng.uniform() < self.h_flip_prob:
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
            flow = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
            valid = valid[:, ::-1]

        H2, W2 = img1.shape[:2]
        y0 = self.rng.integers(0, max(H2 - self.crop_size[0], 0) + 1)
        x0 = self.rng.integers(0, max(W2 - self.crop_size[1], 0) + 1)
        sl = (slice(y0, y0 + self.crop_size[0]), slice(x0, x0 + self.crop_size[1]))
        img1, img2 = img1[sl], img2[sl]
        flow, valid = flow[sl], valid[sl]
        occl_out = np.zeros((*flow.shape[:2], 1), np.float32)
        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow), np.ascontiguousarray(valid),
                occl_out)

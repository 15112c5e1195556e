"""Training-time augmentation for flow+occlusion data (host-side numpy).

Role parity with reference MFT/RAFT/core/utils/augmentor.py: photometric
jitter (symmetric/asymmetric), eraser occlusion, random scale/stretch/flip,
random crop with flow scaling, out-of-frame occlusion marking, and the
sparse-flow-aware variant for KITTI/HD1K. Parameter ranges match the
reference; RNG streams are our own (augmentation is stochastic by design).
"""

import os
import string

import numpy as np
import cv2


def _perlin_noise_2d(shape, res, rng):
    """Gradient (Perlin) noise in [-1, 1] on an H x W grid.

    ``res`` is the lattice resolution (cells per axis); ``shape`` must be a
    multiple of ``res``. Vectorized quintic-fade implementation — role parity
    with the reference's perlin_numpy dependency (augmentor.py:58), written
    from the textbook algorithm.
    """
    H, W = shape
    gy, gx = res
    d0, d1 = H // gy, W // gx
    angles = 2.0 * np.pi * rng.random((gy + 1, gx + 1))
    grad = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    y = np.arange(H, dtype=np.float64) / d0
    x = np.arange(W, dtype=np.float64) / d1
    yi = np.minimum(y.astype(np.int64), gy - 1)
    xi = np.minimum(x.astype(np.int64), gx - 1)
    yf = (y - yi)[:, None]
    xf = (x - xi)[None, :]
    g00 = grad[yi][:, xi]
    g01 = grad[yi][:, xi + 1]
    g10 = grad[yi + 1][:, xi]
    g11 = grad[yi + 1][:, xi + 1]
    n00 = g00[..., 0] * xf + g00[..., 1] * yf
    n01 = g01[..., 0] * (xf - 1.0) + g01[..., 1] * yf
    n10 = g10[..., 0] * xf + g10[..., 1] * (yf - 1.0)
    n11 = g11[..., 0] * (xf - 1.0) + g11[..., 1] * (yf - 1.0)
    u = xf ** 3 * (xf * (xf * 6.0 - 15.0) + 10.0)
    v = yf ** 3 * (yf * (yf * 6.0 - 15.0) + 10.0)
    nx0 = n00 * (1.0 - u) + n01 * u
    nx1 = n10 * (1.0 - u) + n11 * u
    return np.sqrt(2.0) * (nx0 * (1.0 - v) + nx1 * v)


# JPEG-corruption severity -> libjpeg quality, matching the imagecorruptions
# package's jpeg_compression table used by the reference via
# iaa.imgcorruptlike.JpegCompression (augmentor.py:216); severities 1..3.
_JPEG_SEVERITY_QUALITY = {1: 25, 2: 18, 3: 15}


def jpeg_corrupt(img, severity, ):
    """Encode+decode ``img`` (uint8 RGB) as JPEG at the given severity.

    cv2 assumes BGR channel order, but training frames are RGB — flip for
    the codec so chroma subsampling degrades the same channels as the
    reference's RGB-correct PIL/imagecorruptions pipeline.
    """
    quality = _JPEG_SEVERITY_QUALITY[int(severity)]
    ok, buf = cv2.imencode(".jpg", img[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1]


class BlendAugmenter:
    """Lighten-only blend of a random distractor image through Perlin alpha.

    Role parity with reference augmentor.py:26-93 (``BlendAugmenter``): pick a
    random image under ``source_dir``, resize to the frame, modulate its alpha
    with clipped Perlin noise, and lighten-only blend it identically into both
    frames with random opacity in [0, 0.6].
    """

    def __init__(self, source_dir=None, do_blend_transform=True,
                 blend_prop=0.5, blend_clip_min=0.5, blend_clip_max=0.8,
                 octaves=8, rng=None):
        self.do_blend_transform = bool(do_blend_transform and source_dir)
        self.blend_prop = blend_prop
        self.blend_clip_min = blend_clip_min
        self.blend_clip_max = blend_clip_max
        self.octaves = octaves
        self.rng = rng if rng is not None else np.random.default_rng()
        self.image_list = []
        if self.do_blend_transform:
            for root, _dirs, files in os.walk(source_dir):
                self.image_list += [os.path.join(root, f) for f in files]
            self.image_list.sort()
            self.do_blend_transform = bool(self.image_list)

    def _perlin_alpha(self, H, W):
        g = self.octaves
        Hb = ((H // g ** 2) + 1) * g ** 2
        Wb = ((W // g ** 2) + 1) * g ** 2
        noise = _perlin_noise_2d((Hb, Wb), (g, g), self.rng)[:H, :W]
        noise = noise - noise.min()
        noise = np.clip(noise, self.blend_clip_min, self.blend_clip_max)
        noise = noise - self.blend_clip_min
        m = noise.max()
        return noise / m if m > 0 else noise

    def _lighten_only(self, img, blend_rgb, alpha, opacity):
        """max-blend composited at per-pixel ratio alpha*opacity."""
        ratio = (alpha * opacity)[..., None]
        comp = np.maximum(img.astype(np.float32), blend_rgb)
        out = comp * ratio + img.astype(np.float32) * (1.0 - ratio)
        return np.round(out).astype(np.uint8)

    def __call__(self, img1, img2):
        if not self.do_blend_transform or self.rng.uniform() >= self.blend_prop:
            return img1, img2
        H, W = img1.shape[:2]
        path = self.image_list[int(self.rng.integers(len(self.image_list)))]
        blend = cv2.imread(path, cv2.IMREAD_COLOR)
        if blend is None:
            return img1, img2
        blend = cv2.cvtColor(blend, cv2.COLOR_BGR2RGB).astype(np.float32)
        blend = cv2.resize(blend, (W, H), interpolation=cv2.INTER_AREA)
        alpha = self._perlin_alpha(H, W)
        opacity = self.rng.uniform(0.0, 0.6)
        return (self._lighten_only(img1, blend, alpha, opacity),
                self._lighten_only(img2, blend, alpha, opacity))


class TextAugmenter:
    """Random text overlays rendered identically on both frames.

    Role parity with reference augmentor.py:96-154 (``TextAugmenter``): 1..max
    layers of random strings at random font/size/color/position, optionally
    alpha-blended; text pixels are marked invalid in the flow validity mask.
    """

    def __init__(self, do_add_text=False, max_add_text=3, add_text_prop=0.5,
                 set_text_flow_invalid=True, min_length_text=5,
                 max_length_text=20, font_size_max=2.5, font_thickness_max=5,
                 wb_text_prop=0.5, alpha_text_prop=0.5, rng=None):
        self.do_add_text = do_add_text
        self.max_add_text = max_add_text
        self.add_text_prop = add_text_prop
        self.set_text_flow_invalid = set_text_flow_invalid
        self.min_length_text = min_length_text
        self.max_length_text = max_length_text
        self.font_size_max = font_size_max
        self.font_thickness_max = font_thickness_max
        self.wb_text_prop = wb_text_prop
        self.alpha_text_prop = alpha_text_prop
        self.rng = rng if rng is not None else np.random.default_rng()

    def _random_string(self, length):
        chars = string.digits + string.ascii_letters + "    "
        idx = self.rng.integers(len(chars), size=length)
        return "".join(chars[i] for i in idx)

    def _add_text(self, img1, img2, valid):
        # previous layer may have alpha-blended to float; putText needs u8
        img1 = np.round(img1).astype(np.uint8)
        img2 = np.round(img2).astype(np.uint8)
        rng = self.rng
        font = int(rng.integers(0, 8))
        if rng.uniform() > self.wb_text_prop:
            color = tuple(int(c) for c in rng.integers(0, 256, size=3))
        else:
            c = int(rng.integers(0, 256))
            color = (c, c, c)
        text = self._random_string(
            int(rng.integers(self.min_length_text, self.max_length_text + 1)))
        pos = (int(rng.integers(0, img1.shape[1])),
               int(rng.integers(0, img1.shape[0])))
        size = rng.uniform() * self.font_size_max
        thick = int(rng.integers(1, self.font_thickness_max + 1))

        img1_t = cv2.putText(img1.copy(), text, pos, font, size, color,
                             thickness=thick)
        img2_t = cv2.putText(img2.copy(), text, pos, font, size, color,
                             thickness=thick)
        mask = np.ones_like(img1)
        mask = cv2.putText(mask, text, pos, font, size, (0, 0, 0),
                           thickness=thick)
        if self.set_text_flow_invalid:
            valid = valid * (mask[..., 0] > 0)
        if rng.uniform() < self.alpha_text_prop:
            a = rng.uniform()
            img1_t = a * img1_t + (1.0 - a) * img1
            img2_t = a * img2_t + (1.0 - a) * img2
        return img1_t, img2_t, valid

    def __call__(self, img1, img2, valid):
        if self.do_add_text and self.rng.uniform() < self.add_text_prop:
            for _ in range(int(self.rng.integers(1, self.max_add_text + 1))):
                img1, img2, valid = self._add_text(img1, img2, valid)
            img1 = img1.astype(np.uint8)
            img2 = img2.astype(np.uint8)
        return img1, img2, valid


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
                 do_flip=True, load_occlusion=False, asymmetric_color_aug_prob=1.0,
                 spatial_aug_prob=0.8, eraser_aug_prob=0.5, stretch_prob=0.8,
                 max_stretch=0.2, h_flip_prob=0.5, v_flip_prob=0.1,
                 out_of_frame_occlusion=True, seed=None,
                 do_jpeg_transform=False, jpeg_prop=0.8,
                 blend_source=None, do_blend_transform=None, blend_prop=0.5,
                 do_add_text_transform=False, add_text_prop=0.5,
                 max_add_text=3):
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
        # corruption/overlay augmenters (reference augmentor.py:169-183):
        # blend -> text -> jpeg, applied after the spatial transform.
        self.do_jpeg_transform = do_jpeg_transform
        self.jpeg_prop = jpeg_prop
        if do_blend_transform is None:
            do_blend_transform = blend_source is not None
        self.blend_aug = BlendAugmenter(
            source_dir=blend_source, do_blend_transform=do_blend_transform,
            blend_prop=blend_prop, rng=self.rng)
        self.text_aug = TextAugmenter(
            do_add_text=do_add_text_transform, max_add_text=max_add_text,
            add_text_prop=add_text_prop, rng=self.rng)

    # -- photometric -------------------------------------------------------
    def color_transform(self, img1, img2):
        """Strong SYMMETRIC jitter always, then (with prob) a weak
        asymmetric per-image pass — reference augmentor.py:195-208 (its
        defaults: strong 0.4/0.4/0.4/0.5pi symmetric, weak 0.2/0.2/0.2/0.05
        asymmetric at asymmetric_color_aug_prob, default 1)."""
        stacked = np.concatenate([img1, img2], axis=0)
        stacked = _adjust_photometric(stacked, self.rng)
        img1, img2 = np.split(stacked, 2, axis=0)
        if self.rng.uniform() < self.asymmetric_color_aug_prob:
            weak = dict(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.05)
            img1 = _adjust_photometric(img1, self.rng, **weak)
            img2 = _adjust_photometric(img2, self.rng, **weak)
        return img1, img2

    def jpeg_transform(self, img1, img2):
        """JPEG-corrupt both frames at a shared random severity 1..3
        (reference augmentor.py:212-218)."""
        if self.do_jpeg_transform and self.rng.uniform() < self.jpeg_prop:
            severity = int(self.rng.integers(1, 4))
            img1 = jpeg_corrupt(img1, severity)
            img2 = jpeg_corrupt(img2, severity)
        return img1, img2

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
    def spatial_transform(self, img1, img2, flow, occl, valid=None):
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
            if valid is not None:
                valid = cv2.resize(valid, new_wh,
                                   interpolation=cv2.INTER_LINEAR)

        if self.do_flip:
            if self.rng.uniform() < self.h_flip_prob:
                img1 = img1[:, ::-1]
                img2 = img2[:, ::-1]
                flow = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
                occl = occl[:, ::-1] if occl is not None else None
                valid = valid[:, ::-1] if valid is not None else None
            if self.rng.uniform() < self.v_flip_prob:
                img1 = img1[::-1]
                img2 = img2[::-1]
                flow = flow[::-1] * np.array([1.0, -1.0], np.float32)
                occl = occl[::-1] if occl is not None else None
                valid = valid[::-1] if valid is not None else None

        H2, W2 = img1.shape[:2]
        y0 = self.rng.integers(0, H2 - self.crop_size[0] + 1)
        x0 = self.rng.integers(0, W2 - self.crop_size[1] + 1)
        sl = (slice(y0, y0 + self.crop_size[0]), slice(x0, x0 + self.crop_size[1]))
        img1, img2, flow = img1[sl], img2[sl], flow[sl]
        occl = occl[sl] if occl is not None else None
        valid = valid[sl] if valid is not None else None
        cc = lambda a: np.ascontiguousarray(a) if a is not None else None
        return cc(img1), cc(img2), cc(flow), cc(occl), cc(valid)

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
        if not self.load_occlusion:
            # with real occlusion GT the eraser would corrupt it
            # (reference augmentor.py:307-308)
            img1, img2 = self.eraser_transform(img1, img2)
        # a caller-supplied valid (e.g. Kubric correct_flow ambiguity mask)
        # is transformed WITH the sample; only when absent is it derived
        # from the flow magnitude (reference augmentor.py:309-312)
        if valid is None:
            valid = ((np.abs(flow[..., 0]) < 1000)
                     & (np.abs(flow[..., 1]) < 1000))
        valid = np.asarray(valid, np.float32)
        valid = valid[..., 0] if valid.ndim == 3 else valid
        img1, img2, flow, occl2d, valid = self.spatial_transform(
            img1, img2, flow, occl2d, valid)
        # post-spatial corruptions, reference order: blend -> text -> jpeg
        # (augmentor.py:313-315)
        img1, img2 = self.blend_aug(img1, img2)
        img1, img2, valid = self.text_aug(img1, img2, valid)
        img1, img2 = self.jpeg_transform(img1, img2)
        valid = valid.astype(np.float32)
        if occl2d is not None and self.out_of_frame_occlusion:
            occl2d = self.mark_out_of_frame_occluded(flow, occl2d)
        occl_out = occl2d[..., None] if occl2d is not None else None
        return img1, img2, flow, valid, occl_out


class SparseFlowAugmenter:
    """Sparse-flow (KITTI/HD1K) augmentation with validity-aware resize.

    Reference parity: augmentor.py:327-501 — sparse flow maps are resized by
    scattering the valid flow vectors into the resized grid instead of
    interpolating across invalid holes (resize_sparse_flow_map, :393).
    """

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False,
                 load_occlusion=False, seed=None, **kwargs):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.do_flip = do_flip
        self.rng = np.random.default_rng(seed)
        self.spatial_aug_prob = 0.8
        self.h_flip_prob = 0.5
        self.eraser_aug_prob = 0.5
        # jpeg/blend/text corruption augmenters are supported here too
        # (reference augmentor.py:338-353, 488-490)
        self._dense = FlowAugmenter(crop_size, seed=seed, **kwargs)
        self._dense.rng = self.rng
        self._dense.blend_aug.rng = self.rng
        self._dense.text_aug.rng = self.rng

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

    def color_transform(self, img1, img2):
        """SYMMETRIC-only, weaker jitter than the dense augmenter
        (reference SparseFlowAugmentor, augmentor.py:360, 364-369:
        ColorJitter 0.3/0.3/0.3/0.3pi with no asymmetric pass)."""
        stacked = np.concatenate([img1, img2], axis=0)
        stacked = _adjust_photometric(stacked, self.rng, brightness=0.3,
                                      contrast=0.3, saturation=0.3,
                                      hue=0.3 / 3.14)
        return np.split(stacked, 2, axis=0)

    def __call__(self, img1, img2, flow, valid=None, occl=None):
        if valid is None:
            valid = np.ones(flow.shape[:2], np.float32)
        if valid.ndim == 3:
            valid = valid[..., 0]
        img1, img2 = self.color_transform(img1, img2)
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
        img1, img2 = self._dense.blend_aug(img1, img2)
        img1, img2, valid = self._dense.text_aug(img1, img2, valid)
        img1, img2 = self._dense.jpeg_transform(img1, img2)
        valid = valid.astype(np.float32)
        occl_out = np.zeros((*flow.shape[:2], 1), np.float32)
        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow), np.ascontiguousarray(valid),
                occl_out)

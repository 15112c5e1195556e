"""Video input/output: files or image directories, frame generators, writer.

Role parity: GeneralVideoCapture / get_video_frames / get_video_length
(reference MFT/utils/io.py:566-615) and VideoWriter (vis_utils.py:621-658).
"""

import os
from collections import deque
from pathlib import Path

import cv2
import numpy as np


class GeneralVideoCapture:
    """cv2.VideoCapture that also accepts a directory of images."""

    def __init__(self, path, reverse=False):
        path = Path(path)
        self.image_inputs = path.is_dir()
        if self.image_inputs:
            self.path = path
            exts = {".jpg", ".jpeg", ".png"}
            self.images = sorted(p for p in path.iterdir()
                                 if p.suffix.lower() in exts)
            if reverse:
                self.images = self.images[::-1]
            self.i = 0
        else:
            self.cap = cv2.VideoCapture(str(path))

    def read(self):
        if self.image_inputs:
            if self.i >= len(self.images):
                return False, None
            self.frame_src = self.images[self.i].name
            img = cv2.imread(str(self.images[self.i]))
            self.i += 1
            return True, img
        return self.cap.read()

    def release(self):
        if not self.image_inputs:
            self.cap.release()


def get_video_frames(path, reverse=False):
    """Generator of (H, W, 3) uint8 BGR frames."""
    cap = GeneralVideoCapture(path, reverse=reverse)
    try:
        while True:
            ok, frame = cap.read()
            if not ok or frame is None:
                return
            yield frame
    finally:
        cap.release()


def get_video_length(path):
    return sum(1 for _ in get_video_frames(path))


class VideoWriter:
    """mp4 (or image-sequence) writer for visualizations."""

    def __init__(self, path, fps=25.0):
        self.path = Path(path)
        self.fps = fps
        self.writer = None
        self.image_dir = self.path.suffix == ""
        if self.image_dir:
            self.path.mkdir(parents=True, exist_ok=True)
            self.i = 0
        else:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, frame):
        """frame: (H, W, 3) uint8 BGR."""
        frame = np.asarray(frame)
        if self.image_dir:
            cv2.imwrite(str(self.path / f"{self.i:05d}.jpg"), frame)
            self.i += 1
            return
        if self.writer is None:
            H, W = frame.shape[:2]
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self.writer = cv2.VideoWriter(str(self.path), fourcc, self.fps, (W, H))
        self.writer.write(frame)

    def close(self):
        if self.writer is not None:
            self.writer.release()
            self.writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class LookaheadIter:
    """Iterator wrapper with non-consuming peek/lookahead (reference
    MFT/utils/io.py:64-87) — used to inspect upcoming frames without
    advancing the decode position."""

    def __init__(self, it):
        self._iter = iter(it)
        self._ahead = deque()

    def __iter__(self):
        return self

    def __next__(self):
        if self._ahead:
            return self._ahead.popleft()
        return next(self._iter)

    def lookahead(self):
        for x in self._ahead:
            yield x
        for x in self._iter:
            self._ahead.append(x)
            yield x

    def peek(self, *default):
        return next(iter(self.lookahead()), *default)

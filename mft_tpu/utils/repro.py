"""Reproducibility helpers: git state capture + code snapshot export.

Role parity with reference MFT/utils/repro.py:7-43 (code_export rsyncs *.py
into each experiment export dir; git helpers record the exact code state).
"""

import logging
import shutil
import subprocess
from pathlib import Path

logger = logging.getLogger(__name__)

REPO_ROOT = Path(__file__).resolve().parents[2]


def _git(*args):
    try:
        return subprocess.run(["git", "-C", str(REPO_ROOT), *args],
                              capture_output=True, text=True, timeout=20).stdout.strip()
    except Exception:
        return ""


def git_commit():
    return _git("rev-parse", "HEAD")


def git_dirty():
    return bool(_git("status", "--porcelain"))


def git_diff():
    return _git("diff")


def code_export(dst_dir):
    """Snapshot all repo .py files (+ git state) into ``dst_dir``."""
    dst = Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    for src in REPO_ROOT.rglob("*.py"):
        rel = src.relative_to(REPO_ROOT)
        if any(part.startswith(".") or part in ("export", "flow_cache", "demo_out")
               for part in rel.parts):
            continue
        target = dst / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, target)
    (dst / "GIT_STATE").write_text(
        f"commit: {git_commit()}\ndirty: {git_dirty()}\n")
    if git_dirty():
        (dst / "GIT_DIFF").write_text(git_diff())
    logger.debug("code exported to %s", dst)

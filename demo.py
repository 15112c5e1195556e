#!/usr/bin/env python
"""Entry point: python demo.py --video <mp4-or-image-dir>  (see mft_tpu/apps/demo.py)."""

from mft_tpu.apps.demo import main

if __name__ == "__main__":
    main()

#!/bin/bash
# Fetch the reference's trained checkpoints and convert them for mft-tpu.
#
# Role parity with the reference's MFT/RAFT/download_models.sh (dropbox
# models.zip). The trained MFT checkpoint itself
# (raft-things-sintel-kubric-splitted-occlusion-uncertainty-non-occluded-base-sintel.pth)
# is NOT bundled in the reference repo either (.MISSING_LARGE_BLOBS) — obtain
# it from the MFT release page, then convert the torch state dict to a flax
# msgpack usable by configs/flow/raftou_default.py:
#
#   python -m mft_tpu.models.raft.convert checkpoints/MFT_files/<name>.pth \
#          checkpoints/raftou.msgpack
#
# This container has no network egress; the script only documents the steps.
set -e
mkdir -p checkpoints
echo "Download https://www.dropbox.com/s/4j4z58wuv8o0mfz/models.zip (RAFT base models)"
echo "and the MFT release checkpoint into ./checkpoints, then run the converter above."

"""Training stack: losses, optimizer/freezing, augmentation, datasets, loop.

Role parity with reference MFT/RAFT/train.py + core/datasets.py +
core/utils/augmentor.py. The official MFT recipe finetunes ONLY the
OcclusionAndUncertaintyBlock on top of a frozen RAFT (train_params.txt:5-7);
full RAFT training is supported as well.
"""

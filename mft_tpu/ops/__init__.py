"""TPU-native Pallas kernels for the hot ops.

These are the TPU equivalents of the reference's native CUDA path
(MFT/RAFT/alt_cuda_corr/correlation_kernel.cu): fused kernels that keep the
working set in VMEM instead of bouncing intermediates through HBM.
"""

from mft_tpu.ops.corr_lookup_pallas import (
    corr_lookup_pallas,
    corr_lookup_pallas_t,
)

__all__ = ["corr_lookup_pallas", "corr_lookup_pallas_t"]

"""mft-tpu: TPU-native dense long-term video point tracking (JAX/XLA/Pallas).

A brand-new framework with the capabilities of serycjon/MFT ("MFT: Long-Term
Tracking of Every Pixel", WACV 2024), designed TPU-first:

- ``mft_tpu.core``     FlowOU value type (pytree) + bilinear gather/splat numerics
- ``mft_tpu.kernels``  Pallas TPU kernels for the hot ops (corr lookup, chaining)
- ``mft_tpu.models``   RAFT-OU optical flow network (flax, NHWC, lax.scan GRU)
- ``mft_tpu.tracker``  MFT delta-chaining tracker (single jitted step, batched deltas)
- ``mft_tpu.io``       flowou codecs, video capture, tiered flow cache
- ``mft_tpu.parallel`` device mesh / sharding / multi-clip streaming
- ``mft_tpu.train``    losses, optimizer, datasets, checkpointing
- ``mft_tpu.eval``     TAP-Vid datasets, metrics, runners, report
"""

__version__ = "0.1.0"

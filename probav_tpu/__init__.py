"""probav_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-frame super-resolution framework.

A from-scratch rebuild of the capabilities of the PROBA-V "EnhanceMe!" stack
(reference: mmbajo/PROBA-V, ESA PROBA-V super-resolution competition top-2):

- ``probav_tpu.config``      cfg-file parser (reference-compatible INI dialect).
- ``probav_tpu.ops``         shift-compensated loss kernels (XLA + Pallas),
                             FFT registration, patch extraction, Sobel, SSIM.
- ``probav_tpu.models``      WDSR-B 3D fusion net (flax), iWDSR, FuseNet.
- ``probav_tpu.data``        five-stage resumable preprocessing pipeline + loaders.
- ``probav_tpu.train``       shard_map/pjit data+tensor-parallel trainer, optax,
                             orbax checkpointing, TensorBoard metrics.
- ``probav_tpu.parallel``    device-mesh and sharding utilities.
- ``probav_tpu.infer``       full-scene tiled resolver + ESA submission writer.
- ``probav_tpu.evaluation``  per-scene cPSNR comparison tooling.
"""

__version__ = "0.3.0"

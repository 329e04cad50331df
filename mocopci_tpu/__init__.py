"""mocopci_tpu — a TPU-native rebuild of MoCoPCI (inter-frame motion-correlation
guided one-shot 3D point-cloud interpolation, Pattern Recognition 2026).

Layer map (mirrors SURVEY.md §1, re-architected for JAX/XLA/Pallas):
  - ``ops``      — point-cloud op library (kNN, FPS, gather/group, 3-NN
                   interpolation, Chamfer, approx-EMD) replacing the reference
                   CUDA extensions.
  - ``nn``       — flax building blocks (PointConv, cross/bidirectional layers,
                   EI-crossformer, multi-frame attention, point transformer).
  - ``models``   — the MoCoPCI model (encoder + multi-frame estimator).
  - ``data``     — NL-Drive loader + synthetic clouds.
  - ``training`` — loss, optimiser schedule, train/eval steps, checkpointing.
  - ``parallel`` — device-mesh / sharding utilities.
"""

__version__ = "0.1.0"

"""Pallas TPU kernels for ops where plain XLA loses:

  - ``fps``: farthest point sampling — inherently sequential; the kernel keeps
    the xyz tile and the running min-distance field resident in VMEM for the
    whole selection loop.
  - ``knn``: tiled masked top-k — avoids materialising the (N, M) distance
    matrix in HBM at stress sizes.
"""
